"""Dispersion: spectral-eta dielectrics collapse paths to the hero
wavelength (reference /root/reference/src/material.rs:609-620,729-733
``lambda.terminate_secondary()``).

Our implementation reweights throughput at the first dispersive hit
(hero x N, secondaries x 0 — integrators/path.py::_apply_dispersion),
which is estimator-equivalent to the reference's pdf zeroing for all
post-termination contributions and keeps the (still valid) earlier ones.

Checks: (a) the material-table dispersive census, (b) unbiasedness — a
*constant* dense eta row flagged dispersive renders the same image in
expectation as the scalar-eta material, (c) a strongly varying eta makes
the estimate hero-wavelength dependent (nonzero inter-wavelength
divergence), (d) the wavefront integrator carries the termination and
matches the megakernel exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.film.filters import BoxFilter
from shimmer_tpu.film.film import PixelSensor, RgbFilm
from shimmer_tpu.lights import lights as lt
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.ops.transform import Transform
from shimmer_tpu.render import (
    make_wave_renderer,
    make_wavefront_renderer,
    pixel_blocks,
)
from shimmer_tpu.samplers import IndependentSampler
from shimmer_tpu.scene_builder import build_scene
from shimmer_tpu.spectra.spectrum import LAMBDA_MIN, LAMBDA_MAX

RES = 16
SPP = 48
DEPTH = 5


def _eta_row(lo, hi):
    """Dense (471,) eta table varying linearly from lo at 360nm to hi
    at 830nm."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0)
    t = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    return ((1.0 - t) * lo + t * hi).astype(np.float32)


def _glass_scene(eta_row=None, eta_float=1.5):
    cs = get_named_color_space("srgb")
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 0.0, -3.0]),
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    cam = PerspectiveCamera(ct, (RES, RES), fov=40.0)
    film = RgbFilm((RES, RES), BoxFilter(), PixelSensor(cs), cs)
    mat = {"kind": mtl.DIELECTRIC, "eta_float": eta_float}
    table = None
    if eta_row is not None:
        mat["eta_spec"] = 0
        table = np.asarray(eta_row, np.float32)[None]
    scene = build_scene(
        spheres=[{"radius": 1.0, "material_id": 0}],
        materials=[mat],
        lights=[
            {
                "kind": lt.UNIFORM_INFINITE,
                "spectrum": cs.illuminant,
                "photometric": True,
            }
        ],
        spectra_table=table,
        render_from_world=cam.camera_transform.render_from_world(),
    )
    return scene, cam, film


def _render(scene, cam, film, spp=SPP, kind="path"):
    sampler = IndependentSampler(spp, seed=3)
    blocks, valids = pixel_blocks(film, RES * RES)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    if kind == "path":
        fn = make_wave_renderer(scene, cam, film, sampler, "path", max_depth=DEPTH)
    else:
        fn = make_wavefront_renderer(scene, cam, film, sampler, max_depth=DEPTH)
    st = fn(film.init_state(), idx, blocks[0], valids[0])
    return np.asarray(film.get_image(st))


def test_dispersive_census():
    scene, _, _ = _glass_scene(eta_row=_eta_row(1.6, 1.45))
    assert scene.materials.has_dispersion
    assert bool(scene.materials.dispersive[0])
    scene2, _, _ = _glass_scene(eta_row=None)
    assert not scene2.materials.has_dispersion


def test_constant_spectral_eta_matches_scalar_eta():
    """The hero-collapse reweight must be unbiased: a constant eta row
    (still census-flagged dispersive) renders the same image, within MC
    noise, as the plain scalar-eta dielectric under common random numbers."""
    img_disp = _render(*_glass_scene(eta_row=_eta_row(1.5, 1.5)))
    img_ref = _render(*_glass_scene(eta_row=None, eta_float=1.5))
    assert np.isfinite(img_disp).all()
    # With CRN the only difference is the secondary-wavelength reweight:
    # identical refraction geometry, so a tight *mean* match is expected.
    m_d, m_r = img_disp.mean(), img_ref.mean()
    np.testing.assert_allclose(m_d, m_r, rtol=0.05, err_msg=f"{m_d} vs {m_r}")


def test_varying_eta_produces_dispersion():
    """A strongly wavelength-dependent eta must change the image (hero-
    dependent refraction) and stay finite."""
    img_disp = _render(*_glass_scene(eta_row=_eta_row(1.7, 1.4)))
    img_const = _render(*_glass_scene(eta_row=None, eta_float=1.55))
    assert np.isfinite(img_disp).all() and img_disp.mean() > 0.0
    # Inter-wavelength divergence: with dispersion, per-pixel chroma in the
    # refracted region differs from the constant-eta render beyond noise.
    d = np.abs(img_disp - img_const).mean()
    assert d > 1e-3, f"dispersive render identical to constant-eta ({d})"
    # chroma (channel spread) should be present in the dispersive image
    chroma = (img_disp.max(-1) - img_disp.min(-1)).mean()
    assert chroma > 1e-4, f"no inter-wavelength divergence ({chroma})"


def test_wavefront_carries_termination():
    """Wavefront and megakernel share the estimator — including the
    dispersion reweight carried across bounces in the lane state."""
    scene, cam, film = _glass_scene(eta_row=_eta_row(1.7, 1.4))
    img_mk = _render(scene, cam, film, spp=8, kind="path")
    img_wf = _render(scene, cam, film, spp=8, kind="wavefront")
    assert np.isfinite(img_wf).all()
    diff = np.abs(img_wf - img_mk)
    rel = diff.max() / max(img_mk.max(), 1e-6)
    assert rel < 2e-3, f"wavefront diverges from megakernel: rel {rel}"
