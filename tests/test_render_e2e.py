"""End-to-end render tests — BASELINE config #1 class
(diffuse sphere + area light) plus analytic furnace tests.

The reference ships no golden images (SURVEY.md §4: scenes live in an
external repo), so correctness gates are analytic: a furnace test has a
closed-form answer (for a *convex* diffuse surface in a uniform environment
L_o = albedo · L_env), plus integrator cross-checks (random-walk /
simplepath / path must converge to the same image).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.film.filters import BoxFilter
from shimmer_tpu.film.film import PixelSensor, RgbFilm
from shimmer_tpu.lights import lights as lt
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.ops.transform import Transform
from shimmer_tpu.render import render
from shimmer_tpu.samplers import IndependentSampler, ZSobolSampler
from shimmer_tpu.scene_builder import build_scene
from shimmer_tpu.spectra.spectrum import ConstantSpectrum


def _make_camera_film(res=64, fov=45.0, z=-4.0):
    cs = get_named_color_space("srgb")
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 0.0, z]),
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    cam = PerspectiveCamera(ct, (res, res), fov=fov)
    film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
    return cam, film, cs


def _furnace_scene(albedo, cam):
    """Diffuse sphere inside a uniform environment emitting the sRGB
    illuminant (D65) at 1 nit — the photometric convention the reference
    uses (light.rs:599-614), so env pixels resolve to exactly (1,1,1)."""
    cs = get_named_color_space("srgb")
    return build_scene(
        spheres=[{"radius": 1.0, "material_id": 0}],
        materials=[{"kind": mtl.DIFFUSE, "reflectance": albedo}],
        lights=[
            {
                "kind": lt.UNIFORM_INFINITE,
                "spectrum": cs.illuminant,
                "photometric": True,
            }
        ],
        render_from_world=cam.camera_transform.render_from_world(),
    )


class TestFurnace:
    @pytest.mark.parametrize("integrator", ["path", "simplepath", "randomwalk"])
    def test_white_furnace(self, integrator):
        """albedo 1 in a D65 unit env ⇒ every pixel ≈ (1,1,1)."""
        cam, film, cs = _make_camera_film(res=32)
        scene = _furnace_scene([1.0, 1.0, 1.0], cam)
        sampler = IndependentSampler(64)
        depth = 16 if integrator == "path" else 8
        image, _ = render(
            scene, cam, film, sampler, integrator=integrator, spp=64,
            max_depth=depth, wave_spp=32,
        )
        img = np.asarray(image)
        assert np.all(np.isfinite(img))
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, atol=0.06)

    def test_gray_furnace_matches_analytic(self):
        """Convex sphere, albedo ρ: no interreflection ⇒ L = ρ·L_env."""
        rho = 0.5
        cam, film, cs = _make_camera_film(res=32)
        scene = _furnace_scene([rho, rho, rho], cam)
        sampler = IndependentSampler(128)
        image, _ = render(
            scene, cam, film, sampler, integrator="path", spp=128,
            max_depth=6, wave_spp=64,
        )
        img = np.asarray(image)
        center = img[12:20, 12:20].mean(axis=(0, 1))
        np.testing.assert_allclose(center, rho, atol=0.03)
        corner = img[:3, :3].mean(axis=(0, 1))
        np.testing.assert_allclose(corner, 1.0, atol=0.035)


def _area_light_scene(cam, light_y=2.0):
    return build_scene(
        spheres=[
            {"radius": 1.0, "material_id": 0},
            {
                "radius": 0.3,
                "material_id": 1,
                "area_light_id": 0,
                "object_to_world": Transform.translate(
                    jnp.array([0.0, light_y, 0.0])
                ),
            },
        ],
        materials=[
            {"kind": mtl.DIFFUSE, "reflectance": [0.8, 0.4, 0.2]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
        ],
        lights=[
            {
                "kind": lt.AREA,
                "spectrum": ConstantSpectrum(40.0),
                "shape_kind": 0,
                "shape_idx": 1,
            }
        ],
        render_from_world=cam.camera_transform.render_from_world(),
    )


class TestAreaLight:
    def test_integrators_agree(self):
        """Config #1 gate: SimplePath and Path converge to the same image
        (MIS must not change the mean, only the variance)."""
        cam, film, _ = _make_camera_film(res=48, z=-4.0)
        scene = _area_light_scene(cam)
        spp = 256
        imgs = {}
        for integ in ["simplepath", "path"]:
            sampler = IndependentSampler(spp, seed=7)
            image, _ = render(
                scene, cam, film, sampler, integrator=integ, spp=spp,
                max_depth=5, wave_spp=128,
            )
            imgs[integ] = np.asarray(image)
        a, b = imgs["simplepath"], imgs["path"]
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        assert a.max() > 0.05
        mean_err = np.abs(a - b).mean() / max(a.mean(), 1e-6)
        assert mean_err < 0.15, f"integrator disagreement {mean_err}"

    def test_zsobol_unbiased(self):
        """ZSobol at the same spp must agree in the mean with independent."""
        cam, film, _ = _make_camera_film(res=32, z=-4.0)
        scene = _area_light_scene(cam)
        spp = 64
        ind_img, _ = render(
            scene, cam, film, IndependentSampler(spp), "path", spp=spp,
            max_depth=5, wave_spp=64,
        )
        zs_img, _ = render(
            scene, cam, film, ZSobolSampler(spp, (32, 32)), "path", spp=spp,
            max_depth=5, wave_spp=64,
        )
        a, b = np.asarray(ind_img), np.asarray(zs_img)
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.1)

    def test_shadowing(self):
        """Light *below* the big sphere: its top must stay dark."""
        cam, film, _ = _make_camera_film(res=32, z=-4.0)
        scene = _area_light_scene(cam, light_y=-2.0)
        image, _ = render(
            scene, cam, film, IndependentSampler(32), "path", spp=32,
            max_depth=2, wave_spp=32,
        )
        img = np.asarray(image)
        # screen y is flipped: world +y (lit bottom at light_y<0... the
        # light sits below) maps to image rows near the bottom.
        top = img[4:10, 12:20].mean()
        bottom = img[22:28, 12:20].mean()
        assert bottom > 4.0 * max(top, 1e-5), (top, bottom)


class TestPointLight:
    def test_inverse_square(self):
        """Point light falloff: doubling distance quarters irradiance."""
        cam, film, _ = _make_camera_film(res=16, z=-5.0)

        def scene_at(dist):
            return build_scene(
                spheres=[{"radius": 1.0, "material_id": 0}],
                materials=[{"kind": mtl.DIFFUSE, "reflectance": [1.0, 1.0, 1.0]}],
                lights=[
                    {
                        "kind": lt.POINT,
                        "spectrum": ConstantSpectrum(100.0),
                        "position": (0.0, 0.0, -1.0 - dist),
                    }
                ],
                render_from_world=cam.camera_transform.render_from_world(),
            )

        means = []
        # far lights: the measured patch is locally flat, so E ∝ 1/d^2
        for dist in (8.0, 16.0):
            img, _ = render(
                scene_at(dist), cam, film, IndependentSampler(64), "path",
                spp=64, max_depth=1, wave_spp=64,
            )
            means.append(np.asarray(img)[7:9, 7:9].mean())
        ratio = means[0] / means[1]
        assert abs(ratio - 4.0) < 0.25, ratio


def test_stats_registry_collects():
    """--stats plumbing: counters/timers populate during render()
    (utils/stats.py, the pbrt-stats analog)."""
    import jax.numpy as jnp

    from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
    from shimmer_tpu.color.colorspace import get_named_color_space
    from shimmer_tpu.film.filters import BoxFilter
    from shimmer_tpu.film.film import PixelSensor, RgbFilm
    from shimmer_tpu.lights import lights as lt
    from shimmer_tpu.materials import material as mtl
    from shimmer_tpu.ops.transform import Transform
    from shimmer_tpu.render import render
    from shimmer_tpu.samplers import IndependentSampler
    from shimmer_tpu.scene_builder import build_scene
    from shimmer_tpu.spectra.spectrum import ConstantSpectrum
    from shimmer_tpu.utils import stats

    stats.clear()
    cs = get_named_color_space("srgb")
    res = 12
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 0.0, -4.0]), jnp.zeros(3),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    cam = PerspectiveCamera(ct, (res, res), fov=45.0)
    film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
    scene = build_scene(
        spheres=[{"radius": 1.0, "material_id": 0, "area_light_id": 0}],
        materials=[{"kind": mtl.DIFFUSE, "reflectance": [0.5, 0.5, 0.5]}],
        lights=[{"kind": lt.AREA, "spectrum": ConstantSpectrum(5.0),
                 "shape_kind": 0, "shape_idx": 0}],
        render_from_world=cam.camera_transform.render_from_world(),
    )
    render(
        scene, cam, film, IndependentSampler(2), "path", spp=2,
        max_depth=2, collect_stats=True,
    )
    d = stats.as_dict()
    assert d.get("Integrator/Rays traced", 0) > 0
    assert d.get("Integrator/Wavefront iterations", 0) > 0
    assert d.get("Render/Wave time", 0) > 0
    rep = stats.report()
    assert "Rays traced" in rep and "Statistics:" in rep
    stats.clear()


class TestCheckpointResume:
    def test_kill_and_resume_bit_identical(self, tmp_path):
        """Interrupting a checkpointed render and resuming from disk
        produces a bit-identical image (SURVEY §5 aux subsystem; the
        counter-based sampler needs no RNG state)."""
        cam, film, cs = _make_camera_film(res=32)
        scene = _furnace_scene([0.5, 0.5, 0.5], cam)
        sampler = IndependentSampler(4, seed=0)
        ck = tmp_path / "render.ckpt.npz"
        common = dict(
            integrator="path", spp=4, max_depth=3, wave_spp=1,
            checkpoint_path=ck,
        )
        # Uninterrupted reference run (no checkpoint involvement).
        ref, _ = render(scene, cam, film, sampler, integrator="path",
                        spp=4, max_depth=3, wave_spp=1)
        # "Killed" run: only 2 of 4 spp (simulates an interrupt after
        # two waves; the checkpoint file holds the cursor at 2).
        from shimmer_tpu.utils.checkpoint import RenderCheckpointer

        img_partial, st = render(
            scene, cam, film, sampler, integrator="path", spp=2,
            max_depth=3, wave_spp=1,
        )
        # Write the partial state under the FULL render's fingerprint,
        # exactly what the interrupted full render would have written.
        RenderCheckpointer(
            ck,
            fingerprint={
                "resolution": tuple(int(r) for r in film.resolution),
                "spp": 4, "max_depth": 3, "integrator": "path",
                "wavefront": True, "seed": 0, "wave_spp": 1,
            },
        ).save(st, 2)
        # Resume: render() must pick up at spp=2 and finish 2 more.
        resumed, _ = render(scene, cam, film, sampler, **common)
        np.testing.assert_array_equal(np.asarray(resumed), np.asarray(ref))

    def test_stale_checkpoint_ignored(self, tmp_path):
        cam, film, cs = _make_camera_film(res=16)
        scene = _furnace_scene([0.5, 0.5, 0.5], cam)
        sampler = IndependentSampler(2, seed=0)
        ck = tmp_path / "r.ckpt.npz"
        from shimmer_tpu.utils.checkpoint import RenderCheckpointer

        RenderCheckpointer(ck, fingerprint={"spp": 99}).save(
            film.init_state(), 1
        )
        with pytest.warns(UserWarning, match="fingerprint mismatch"):
            img, _ = render(
                scene, cam, film, sampler, integrator="path", spp=2,
                max_depth=2, wave_spp=1, checkpoint_path=ck,
            )
        assert np.isfinite(np.asarray(img)).all()


class TestCoatedFurnace:
    def test_coated_diffuse_white_furnace_bound(self):
        """Analytic coated-diffuse furnace gate (r4 verdict ask): a
        lossless dielectric coat over a WHITE diffuse base in a uniform
        photometric environment must resolve near 1.  Conditional on the
        walk exiting, the estimator conserves energy exactly (measured
        0.999); the only losses are the pbrt-spec walk truncation at
        LAYER_MAX_DEPTH=10 (~7%, bxdf.rs:1282 semantics) — so the gate
        is [0.85, 1.02].  A smooth, optically-thin coat isolates those
        semantics from single-scatter GGX and Tr-absorption losses."""
        cam, film, cs = _make_camera_film(res=24)
        scene = build_scene(
            spheres=[{"radius": 1.0, "material_id": 0}],
            materials=[
                {
                    "kind": mtl.COATED_DIFFUSE,
                    "reflectance": [1.0, 1.0, 1.0],
                    "uroughness": 0.0,
                    "vroughness": 0.0,
                    "eta_float": 1.5,
                    "thickness": 1e-4,
                }
            ],
            lights=[
                {
                    "kind": lt.UNIFORM_INFINITE,
                    "spectrum": cs.illuminant,
                    "photometric": True,
                }
            ],
            render_from_world=cam.camera_transform.render_from_world(),
        )
        img, _ = render(
            scene, cam, film, IndependentSampler(64, seed=0), "path",
            spp=64, max_depth=8, wave_spp=32,
        )
        a = np.asarray(img)
        assert np.isfinite(a).all()
        center = a[10:14, 10:14].mean()
        assert 0.85 < center < 1.02, center
