"""Layered (coated) BxDF tests.

Validates the stochastic LayeredBxDF analog (bxdf.rs:883-1700) by Monte
Carlo cross-checks between its three estimators and against analytic
smooth-coat radiosity (the classic interreflection series for a smooth
dielectric coat over a Lambertian base).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.materials import layered as ly
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.ops import rng as srng
from shimmer_tpu.ops.sampling import sample_uniform_sphere


def _uniforms(n, salt):
    key = jnp.arange(n, dtype=jnp.uint32)
    u1 = srng.u32_to_unit_float(srng.pcg_hash(key + jnp.uint32(salt)))
    u2 = jnp.stack(
        [
            srng.u32_to_unit_float(srng.pcg_hash(key + jnp.uint32(salt + 101))),
            srng.u32_to_unit_float(srng.pcg_hash(key + jnp.uint32(salt + 202))),
        ],
        -1,
    )
    return key, u1, u2


def _coat(n, alpha=0.2, eta=1.5, refl=0.7):
    ones = jnp.ones(n)
    top = ly._TopInterface(eta * ones, alpha * ones, alpha * ones)
    bot = ly._DiffuseBottom(jnp.full((n, 4), refl))
    return top, bot, 0.01 * ones, jnp.zeros((n, 4)), 0.0 * ones


N = 1 << 15
WO = jnp.broadcast_to(jnp.array([0.3, 0.1, 0.9]) / np.linalg.norm([0.3, 0.1, 0.9]), (N, 3))


def test_sample_f_energy_conservation_and_analytic():
    """Directional albedo from sample_f must be < 1 and close to the
    analytic interreflection series for a smooth coat."""
    top, bot, th, alb, g = _coat(N, alpha=0.0)
    key, u1, u2 = _uniforms(N, 7)
    s = ly.layered_sample(top, bot, WO, u1, u2, key, th, alb, g, False)
    est = jnp.where(
        s.valid,
        s.f[..., 0] * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12),
        0.0,
    )
    albedo = float(jnp.mean(est))
    # Analytic: T_in * rho * T_escape / (1 - rho * R_internal), with
    # R_internal ~ 0.596 for eta=1.5 (Walter/Egan), T_in ~ 0.95 at ~20 deg,
    # plus ~0.05 entrance Fresnel reflection; Tr(0.01) losses ~3%.
    assert 0.35 < albedo < 0.60
    # Conservation with a white base.
    top, bot, th, alb, g = _coat(N, alpha=0.0, refl=1.0)
    s = ly.layered_sample(top, bot, WO, u1, u2, key, th, alb, g, False)
    est = jnp.where(
        s.valid,
        s.f[..., 0] * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12),
        0.0,
    )
    assert float(jnp.mean(est)) < 1.02


def test_f_matches_sample_estimator():
    """Uniform-sphere MC of f() agrees with the sample_f albedo."""
    top, bot, th, alb, g = _coat(N, alpha=0.2)
    key, u1, u2 = _uniforms(N, 31)
    s = ly.layered_sample(top, bot, WO, u1, u2, key, th, alb, g, False)
    a_sample = float(
        jnp.mean(
            jnp.where(
                s.valid,
                s.f[..., 0] * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12),
                0.0,
            )
        )
    )
    wi_u = sample_uniform_sphere(u2)
    fv = ly.layered_f(top, bot, WO, wi_u, key + jnp.uint32(91), th, alb, g, False)
    a_f = float(jnp.mean(fv[..., 0] * jnp.abs(wi_u[..., 2])) * 4 * np.pi)
    assert a_sample == pytest.approx(a_f, rel=0.15)


def test_two_sided_symmetry():
    """TwoSided: evaluating from below equals evaluating from above."""
    top, bot, th, alb, g = _coat(N, alpha=0.2)
    key, u1, u2 = _uniforms(N, 57)
    wi = sample_uniform_sphere(u2)
    f_up = ly.layered_f(top, bot, WO, wi, key, th, alb, g, False)
    f_dn = ly.layered_f(top, bot, -WO, -wi, key, th, alb, g, False)
    np.testing.assert_allclose(np.asarray(f_up), np.asarray(f_dn), rtol=1e-5)


def test_pdf_positive_and_bounded():
    top, bot, th, alb, g = _coat(N, alpha=0.2)
    key, u1, u2 = _uniforms(N, 77)
    wi = sample_uniform_sphere(u2)
    p = ly.layered_pdf(top, bot, WO, wi, key)
    p = np.asarray(p)
    assert np.all(p >= 0.1 / (4 * np.pi) - 1e-7)  # uniform floor
    assert np.all(np.isfinite(p))


def test_coated_conductor_runs():
    """CoatedConductor walk produces finite, non-black samples."""
    ones = jnp.ones(N)
    top = ly._TopInterface(1.5 * ones, 0.1 * ones, 0.1 * ones)
    bot = ly._ConductorBottom(
        jnp.full((N, 4), 0.2), jnp.full((N, 4), 3.9), 0.2 * ones, 0.2 * ones
    )
    key, u1, u2 = _uniforms(N, 99)
    th = 0.01 * ones
    alb = jnp.zeros((N, 4))
    s = ly.layered_sample(top, bot, WO, u1, u2, key, th, alb, 0.0 * ones, False)
    est = jnp.where(
        s.valid,
        s.f[..., 0] * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12),
        0.0,
    )
    a = float(jnp.mean(est))
    assert np.isfinite(a) and 0.3 < a < 1.05


def test_medium_albedo_reduces_nothing_blows_up():
    """With a scattering medium in the layer the estimators stay finite
    and energy stays bounded (bxdf.rs medium branch, :1066-1128)."""
    ones = jnp.ones(N)
    top = ly._TopInterface(1.5 * ones, 0.0 * ones, 0.0 * ones)
    bot = ly._DiffuseBottom(jnp.full((N, 4), 0.5))
    key, u1, u2 = _uniforms(N, 123)
    th = 0.3 * ones
    alb = jnp.full((N, 4), 0.8)
    g = 0.3 * ones
    s = ly.layered_sample(top, bot, WO, u1, u2, key, th, alb, g, True)
    est = jnp.where(
        s.valid,
        s.f[..., 0] * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12),
        0.0,
    )
    a = float(jnp.mean(est))
    assert np.isfinite(a) and 0.0 < a < 1.1
    wi_u = sample_uniform_sphere(u2)
    fv = ly.layered_f(top, bot, WO, wi_u, key + jnp.uint32(5), th, alb, g, True)
    assert bool(jnp.all(jnp.isfinite(fv)))


def test_material_dispatch_coated():
    """Material-table dispatch reaches the layered BxDFs."""
    from shimmer_tpu.materials.material import (
        bsdf_f,
        bsdf_pdf,
        bsdf_sample,
        make_material_table,
    )
    from shimmer_tpu.ops.vecmath import Frame
    from shimmer_tpu.spectra.sampled import SampledWavelengths
    from shimmer_tpu.spectra.rgb2spec import fit_rgb_coeffs
    from shimmer_tpu.color.colorspace import get_named_color_space

    cs = get_named_color_space("srgb")
    coeffs = fit_rgb_coeffs(np.array([[0.6, 0.3, 0.2]]), cs)[0]
    mats = make_material_table(
        [
            {
                "kind": mtl.COATED_DIFFUSE,
                "reflectance_coeffs": coeffs,
                "uroughness": 0.1,
                "vroughness": 0.1,
                "eta_float": 1.5,
            }
        ]
    )
    n = 256
    key, u1, u2 = _uniforms(n, 11)
    swl = SampledWavelengths.sample_uniform(jnp.full(n, 0.3))
    mat_id = jnp.zeros(n, jnp.int32)
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    frame = Frame.from_z(z)
    wo = jnp.broadcast_to(jnp.array([0.4, 0.2, 0.89]) / np.linalg.norm([0.4, 0.2, 0.89]), (n, 3))
    kinds = (mtl.COATED_DIFFUSE,)
    s = bsdf_sample(mats, kinds, mat_id, frame, z, wo, u2, u1, swl, rng_key=key)
    assert float(jnp.mean(s.valid)) > 0.5
    wi = sample_uniform_sphere(u2)
    f = bsdf_f(mats, kinds, mat_id, frame, z, wo, wi, swl, rng_key=key)
    p = bsdf_pdf(mats, kinds, mat_id, frame, z, wo, wi, swl, rng_key=key)
    assert bool(jnp.all(jnp.isfinite(f))) and bool(jnp.all(p >= 0))


def test_mix_resolution():
    from shimmer_tpu.materials.material import make_material_table, resolve_mix

    mats = make_material_table(
        [
            {"kind": mtl.DIFFUSE},
            {"kind": mtl.CONDUCTOR},
            {"kind": mtl.MIX, "mix_amount": 0.25, "mix_m1": 0, "mix_m2": 1},
        ]
    )
    n = 1 << 14
    _, u1, _ = _uniforms(n, 3)
    mat_id = jnp.full(n, 2, jnp.int32)
    out = resolve_mix(mats, (mtl.DIFFUSE, mtl.CONDUCTOR, mtl.MIX), mat_id, u1)
    frac0 = float(jnp.mean((out == 0).astype(jnp.float32)))
    assert out.dtype == jnp.int32
    assert frac0 == pytest.approx(0.25, abs=0.02)
    assert not bool(jnp.any(out == 2))
