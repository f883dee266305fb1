"""BilinearPatch shape tests (VERDICT r2 item 6; reference
src/shape/bilinear_patch.rs).

Gates: intersection residuals + agreement with the triangle path on
planar quads, sample/pdf self-consistency, and a quad-area-light render
matching the two-triangle equivalent within MC noise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.film.filters import BoxFilter, get_camera_sample
from shimmer_tpu.film.film import PixelSensor, RgbFilm
from shimmer_tpu.integrators.path import li_path
from shimmer_tpu.lights import lights as lt
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.ops.transform import Transform
from shimmer_tpu.samplers import IndependentSampler
from shimmer_tpu.scene_builder import build_scene
from shimmer_tpu.shapes.bilinear import (
    _bilerp,
    bilinear_intersect,
    bilinear_light_pdf,
    bilinear_light_sample,
    bilinear_occluded,
    make_bilinear_data,
)
from shimmer_tpu.spectra.spectrum import ConstantSpectrum


def _random_patches(rng, n=6, curved=True):
    out = []
    for _ in range(n):
        c = rng.uniform(-2, 2, 3)
        eu = rng.normal(0, 1, 3)
        ev = rng.normal(0, 1, 3)
        p11 = c + eu + ev
        if curved:
            p11 = p11 + rng.normal(0, 0.4, 3)
        out.append(
            {
                "p00": c,
                "p10": c + eu,
                "p01": c + ev,
                "p11": p11,
                "material_id": 0,
            }
        )
    return make_bilinear_data(out)


class TestIntersect:
    def test_residuals(self):
        rng = np.random.default_rng(0)
        data = _random_patches(rng)
        n = 512
        o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        # Aim at random points on random patches so most rays hit.
        uu = rng.uniform(size=(n, 1)).astype(np.float32)
        vv = rng.uniform(size=(n, 1)).astype(np.float32)
        pi = rng.integers(0, data.p00.shape[0], n)
        target = np.asarray(
            _bilerp(
                jnp.asarray(uu), jnp.asarray(vv),
                data.p00[pi], data.p10[pi], data.p01[pi], data.p11[pi],
            )
        )
        d = (target - o).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        si = bilinear_intersect(data, o, d, jnp.full(n, jnp.inf))
        hit = np.asarray(si.valid)
        assert hit.sum() > 20, "expected some hits"
        ph = np.asarray(si.p)[hit]
        oh = np.asarray(o)[hit]
        dh = np.asarray(d)[hit]
        th = np.asarray(si.t)[hit]
        res = np.linalg.norm(oh + th[:, None] * dh - ph, axis=1)
        assert res.max() < 1e-3, res.max()
        # Normal is unit and orthogonal-ish to the local surface: check
        # against a central-difference tangent at the hit uv.
        nrm = np.linalg.norm(np.asarray(si.n)[hit], axis=1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-4)

    def test_flat_quad_matches_triangles(self):
        """A planar quad must agree with its two-triangle split."""
        from shimmer_tpu.shapes.mesh import quad_mesh
        from shimmer_tpu.shapes.triangle import (
            build_triangle_scene,
            triangle_scene_intersect,
        )

        q = [[-1.0, 0.3, -1.0], [1.0, 0.3, -1.0], [1.0, 0.3, 1.0],
             [-1.0, 0.3, 1.0]]
        data = make_bilinear_data(
            [{"p00": q[0], "p10": q[1], "p01": q[3], "p11": q[2]}]
        )
        tris = build_triangle_scene(
            [quad_mesh(Transform.identity(), *q).as_scene_dict(0)]
        )
        rng = np.random.default_rng(1)
        n = 256
        o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        si_p = bilinear_intersect(data, o, d, jnp.full(n, jnp.inf))
        si_t = triangle_scene_intersect(tris, o, d, jnp.full(n, jnp.inf))
        hp = np.asarray(si_p.valid)
        ht = np.asarray(si_t.valid)
        # Watertightness differs only on the shared diagonal (measure 0).
        assert (hp == ht).mean() > 0.99
        both = hp & ht
        np.testing.assert_allclose(
            np.asarray(si_p.t)[both], np.asarray(si_t.t)[both], rtol=1e-4
        )
        occ = bilinear_occluded(data, o, d, jnp.full(n, jnp.inf))
        assert (np.asarray(occ) == hp).all()


class TestSampling:
    def test_sample_pdf_consistency(self):
        """bilinear_light_pdf must reproduce the pdf of each sample.

        Planar patches only: pdf_with_context recovers (u,v) by
        re-intersecting from ref_p (the MIS semantics — the integrator
        only ever sees the nearest visible hit), which on a curved,
        self-occluding patch can be a different fold than the area
        sample."""
        rng = np.random.default_rng(2)
        data = _random_patches(rng, n=3, curved=False)
        n = 256
        idx = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
        ref_p = jnp.asarray(rng.uniform(-4, -3, (n, 3)).astype(np.float32))
        ref_ns = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(1.0)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        p, nrm, pdf = bilinear_light_sample(data, idx, ref_p, ref_ns, u)
        wi = p - ref_p
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        pdf2 = bilinear_light_pdf(data, idx, ref_p, ref_ns, wi, p, nrm)
        m = np.asarray(pdf) > 0
        assert m.mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(pdf2)[m], np.asarray(pdf)[m], rtol=2e-2
        )

    def test_solid_angle_integral(self):
        """MC: E[indicator/pdf] over patch samples equals the solid angle
        computed by ray sampling (planar quad, known geometry)."""
        data = make_bilinear_data(
            [{"p00": [-1, 2, -1], "p10": [1, 2, -1],
              "p01": [-1, 2, 1], "p11": [1, 2, 1]}]
        )
        n = 200_000
        rng = np.random.default_rng(3)
        idx = jnp.zeros(n, jnp.int32)
        ref_p = jnp.zeros((n, 3), jnp.float32)
        ref_ns = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(1.0)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        _, _, pdf = bilinear_light_sample(data, idx, ref_p, ref_ns, u)
        est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-12)))
        # Exact solid angle of the quad from the origin (4 x spherical
        # excess of the symmetric quadrant): use the standard formula
        # for a rectangle at height h.
        a, b, h = 1.0, 1.0, 2.0
        exact = 4.0 * np.arctan(
            (a * b) / (h * np.sqrt(a * a + b * b + h * h))
        )
        np.testing.assert_allclose(est, exact, rtol=2e-2)


class TestRender:
    def _scene(self, use_patch_light):
        from shimmer_tpu.shapes.mesh import quad_mesh
        from shimmer_tpu.shapes.triangle import build_triangle_scene

        cs = get_named_color_space("srgb")
        ct = CameraTransform(
            Transform.look_at(
                jnp.array([0.0, 1.0, -3.5]),
                jnp.array([0.0, 0.5, 0.0]),
                jnp.array([0.0, 1.0, 0.0]),
            )
        )
        res = 24
        cam = PerspectiveCamera(ct, (res, res), fov=45.0)
        film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
        r2w = cam.camera_transform.render_from_world()
        floor = quad_mesh(
            r2w, [-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]
        )
        lq = [[-0.6, 2.0, -0.6], [0.6, 2.0, -0.6], [0.6, 2.0, 0.6],
              [-0.6, 2.0, 0.6]]
        if use_patch_light:
            meshes = [floor.as_scene_dict(0)]
            tris = build_triangle_scene(meshes)
            # Down-facing: cross(dpdu, dpdv) = cross(+x, +z) = -y.
            patches = [
                {
                    "p00": lq[0], "p10": lq[1], "p01": lq[3],
                    "p11": lq[2], "material_id": 1, "area_light_id": 0,
                }
            ]
            lights = [
                {
                    "kind": lt.AREA,
                    "spectrum": ConstantSpectrum(1.0),
                    "scale": 10.0,
                    "shape_kind": 2,
                    "shape_idx": 0,
                }
            ]
            return build_scene(
                triangles=tris,
                patches=patches,
                materials=[
                    {"kind": mtl.DIFFUSE, "reflectance": [0.6, 0.55, 0.5]},
                    {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
                ],
                lights=lights,
                render_from_world=r2w,
            ), cam, film
        lightq = quad_mesh(r2w, *lq)
        meshes = [
            floor.as_scene_dict(0),
            lightq.as_scene_dict(
                1, area_light_id=np.array([0, 1], np.int32)
            ),
        ]
        tris = build_triangle_scene(meshes)
        n_tri = int(np.asarray(tris.orig_indices).shape[0])
        lights = [
            {
                "kind": lt.AREA,
                "spectrum": ConstantSpectrum(1.0),
                "scale": 10.0,
                "shape_kind": 1,
                "shape_idx": n_tri - 2 + k,
            }
            for k in range(2)
        ]
        return build_scene(
            triangles=tris,
            materials=[
                {"kind": mtl.DIFFUSE, "reflectance": [0.6, 0.55, 0.5]},
                {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
            ],
            lights=lights,
            render_from_world=r2w,
        ), cam, film

    @staticmethod
    def _mean_image(scene, cam, film, spp=128):
        res = film.resolution[0]
        sampler = IndependentSampler(spp, seed=5)
        ys, xs = jnp.meshgrid(
            jnp.arange(res, dtype=jnp.int32),
            jnp.arange(res, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

        def one(sample_index):
            s_state = sampler.start_pixel_sample(pixel_xy, sample_index)
            u_lam, s_state = sampler.get_1d(s_state)
            swl = film.sample_wavelengths(u_lam)
            u_f, s_state = sampler.get_pixel_2d(s_state)
            u_l, s_state = sampler.get_2d(s_state)
            p_film, _, u_l = get_camera_sample(film.filter, pixel_xy, u_f, u_l)
            ray = cam.generate_ray(p_film, u_l)
            l = jnp.mean(
                li_path(scene, ray, swl, sampler, s_state, 3), axis=-1
            )
            return l

        vals = jax.lax.map(one, jnp.arange(spp, dtype=jnp.uint32))
        return np.asarray(jnp.mean(vals, axis=0)).reshape(res, res)

    def test_quad_light_matches_two_triangles(self):
        sp, cam, film = self._scene(True)
        st, _, _ = self._scene(False)
        img_p = self._mean_image(sp, cam, film)
        img_t = self._mean_image(st, cam, film)
        assert img_p.mean() > 1e-3
        np.testing.assert_allclose(
            img_p.mean(), img_t.mean(), rtol=2e-2
        )
        # Pixelwise agreement within MC noise on lit pixels.
        lit = img_t > 0.05 * img_t.max()
        rel = np.abs(img_p - img_t)[lit] / img_t[lit]
        assert np.quantile(rel, 0.9) < 0.1, np.quantile(rel, 0.9)
