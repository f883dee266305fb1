"""Microfacet distribution and Fresnel utilities, batched over lanes.

TPU-native analog of /root/reference/src/scattering.rs: Trowbridge-Reitz
(GGX) with visible-normal sampling, dielectric/complex Fresnel, refraction.
Alpha parameters are per-lane arrays; the reference's effectively-smooth
branch becomes a mask callers combine with the rough path.
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.math import lerp, safe_sqrt, sqr
from shimmer_tpu.ops.sampling import sample_uniform_disk_polar
from shimmer_tpu.ops.vecmath import (
    abs_cos_theta,
    abs_dot,
    cos2_theta,
    cos_phi,
    cos_theta,
    cross,
    dot,
    normalize,
    sin_phi,
    tan2_theta,
    vec,
)

EFFECTIVELY_SMOOTH = 1e-3


def clamp_alpha(alpha_x, alpha_y):
    """Non-smooth distributions need alpha >= 1e-4 (scattering.rs:117-127).

    The clamp is unconditional: effectively-smooth lanes (alpha < 1e-3)
    stay classified as smooth after clamping to 1e-4, but the rough-branch
    math they still execute (masked megakernel) no longer overflows f32 —
    unclamped 1e-5 alphas drive GGX's 1/alpha² terms past f32 range and
    the resulting inf poisons reverse-mode gradients of masked lanes."""
    return jnp.maximum(alpha_x, 1e-4), jnp.maximum(alpha_y, 1e-4)


def effectively_smooth(alpha_x, alpha_y):
    return (alpha_x < EFFECTIVELY_SMOOTH) & (alpha_y < EFFECTIVELY_SMOOTH)


def tr_d(wm, alpha_x, alpha_y):
    """GGX normal distribution D(wm) (scattering.rs:138-149)."""
    t2 = tan2_theta(wm)
    cos4 = sqr(cos2_theta(wm))
    ok = jnp.isfinite(t2) & (cos4 >= 1e-16)
    # double-where: sanitize inf tan² BEFORE it enters the product, or
    # reverse-mode AD yields inf·0 = NaN gradients w.r.t. alpha.
    t2 = jnp.where(ok, t2, 0.0)
    e = t2 * (sqr(cos_phi(wm) / alpha_x) + sqr(sin_phi(wm) / alpha_y))
    # e past ~1e16 would overflow sqr(1+e) in f32; D is 0 there anyway.
    ok = ok & (e < 1e16)
    e = jnp.where(ok, e, 0.0)
    d = 1.0 / (jnp.pi * alpha_x * alpha_y * jnp.maximum(cos4, 1e-16) * sqr(1.0 + e))
    return jnp.where(ok, d, 0.0)


def tr_lambda(w, alpha_x, alpha_y):
    t2 = tan2_theta(w)
    finite = jnp.isfinite(t2)
    t2 = jnp.where(finite, t2, 0.0)  # double-where (see tr_d)
    alpha2 = sqr(cos_phi(w) * alpha_x) + sqr(sin_phi(w) * alpha_y)
    lam = (-1.0 + safe_sqrt(1.0 + alpha2 * t2)) / 2.0
    return jnp.where(finite, lam, 0.0)


def tr_g1(w, alpha_x, alpha_y):
    return 1.0 / (1.0 + tr_lambda(w, alpha_x, alpha_y))


def tr_g(wo, wi, alpha_x, alpha_y):
    return 1.0 / (
        1.0 + tr_lambda(wo, alpha_x, alpha_y) + tr_lambda(wi, alpha_x, alpha_y)
    )


def tr_pdf(w, wm, alpha_x, alpha_y):
    """Visible-normal pdf D_w(wm) (scattering.rs:175-184)."""
    return (
        tr_g1(w, alpha_x, alpha_y)
        / jnp.maximum(abs_cos_theta(w), 1e-9)
        * tr_d(wm, alpha_x, alpha_y)
        * abs_dot(w, wm)
    )


def tr_sample_wm(w, u, alpha_x, alpha_y):
    """Visible-normal sampling (Heitz 2018; scattering.rs:186-206)."""
    wh = normalize(
        jnp.stack(
            [alpha_x * w[..., 0], alpha_y * w[..., 1], w[..., 2]], axis=-1
        )
    )
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), wh.shape)
    t1_raw = cross(z, wh)
    straight = wh[..., 2] >= 0.99999
    # double-where: keep the normalize argument well-conditioned on the
    # untaken branch, else its 0/0 NaN poisons reverse-mode gradients.
    t1_safe = jnp.where(
        straight[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), wh.shape),
        t1_raw,
    )
    t1 = jnp.where(
        straight[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), wh.shape),
        normalize(t1_safe),
    )
    t2 = cross(wh, t1)
    p = sample_uniform_disk_polar(u)
    h = safe_sqrt(1.0 - sqr(p[..., 0]))
    py = lerp((1.0 + wh[..., 2]) / 2.0, h, p[..., 1])
    pz = safe_sqrt(1.0 - sqr(p[..., 0]) - sqr(py))
    nh = (
        p[..., 0:1] * t1 + py[..., None] * t2 + pz[..., None] * wh
    )
    return normalize(
        jnp.stack(
            [
                alpha_x * nh[..., 0],
                alpha_y * nh[..., 1],
                jnp.maximum(1e-6, nh[..., 2]),
            ],
            axis=-1,
        )
    )


def roughness_to_alpha(roughness):
    """alpha = sqrt(roughness) (scattering.rs:208)."""
    return jnp.sqrt(jnp.asarray(roughness, jnp.float32))


def regularize_alpha(alpha):
    """Roughen near-specular lobes after non-specular bounces
    (scattering.rs:212-219)."""
    return jnp.where(alpha < 0.3, jnp.clip(2.0 * alpha, 0.1, 0.3), alpha)


# --- Fresnel / refraction (scattering.rs:11-104) ---


def reflect(wo, n):
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction.  Returns (refracted wt, eta_used, valid).

    Handles the wi-on-either-side convention by flipping n/eta
    (scattering.rs refract).  eta is the relative IOR of the surface.
    """
    ci = dot(n, wi)
    flip = ci < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    n_eff = jnp.where(flip[..., None], -n, n)
    ci = jnp.abs(ci)
    s2i = jnp.maximum(0.0, 1.0 - sqr(ci))
    s2t = s2i / sqr(eta_eff)
    tir = s2t >= 1.0
    c2t = jnp.maximum(1.0 - s2t, 0.0)
    ct = safe_sqrt(c2t)
    wt = -wi / eta_eff[..., None] + (
        (ci / eta_eff - ct)[..., None]
    ) * n_eff
    return wt, eta_eff, ~tir


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized dielectric Fresnel reflectance (scattering.rs:44-77)."""
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)
    flip = ci < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    ci = jnp.abs(ci)
    s2i = 1.0 - sqr(ci)
    s2t = s2i / sqr(eta_eff)
    tir = s2t >= 1.0
    ct = safe_sqrt(jnp.maximum(1.0 - s2t, 0.0))
    denom1 = eta_eff * ci + ct
    denom2 = ci + eta_eff * ct
    r_parl = (eta_eff * ci - ct) / jnp.where(denom1 == 0, 1.0, denom1)
    r_perp = (ci - eta_eff * ct) / jnp.where(denom2 == 0, 1.0, denom2)
    f = (sqr(r_parl) + sqr(r_perp)) / 2.0
    return jnp.where(tir, 1.0, f)


def fresnel_complex(cos_theta_i, eta, k):
    """Conductor Fresnel with complex IOR eta - i k (scattering.rs:79-104),
    computed with explicit complex arithmetic on (re, im) pairs."""
    ci = jnp.clip(cos_theta_i, 0.0, 1.0)
    s2 = 1.0 - sqr(ci)
    # eta_c = eta - i k;  eta_c^2 = (eta^2 - k^2) - i (2 eta k)
    e2r = sqr(eta) - sqr(k)
    e2i = -2.0 * eta * k
    # sin2_t = s2 / eta_c^2  (complex division)
    denom = sqr(e2r) + sqr(e2i)
    denom = jnp.where(denom == 0, 1.0, denom)
    s2tr = s2 * e2r / denom
    s2ti = -s2 * e2i / denom
    # cos_t = sqrt(1 - sin2_t)  (complex sqrt)
    c2r = 1.0 - s2tr
    c2i = -s2ti
    # safe_sqrt (custom-JVP): raw sqrt(max(x,0)) has an infinite derivative
    # at x == 0 (exactly hit when c2i == 0), which NaNs reverse-mode AD.
    r = jnp.sqrt(jnp.maximum(sqr(c2r) + sqr(c2i), 1e-30))
    ctr = safe_sqrt((r + c2r) / 2.0)
    cti = jnp.sign(c2i + 1e-30) * safe_sqrt((r - c2r) / 2.0)
    # r_parl = (eta_c ci - cos_t) / (eta_c ci + cos_t)
    ar = eta * ci
    ai = -k * ci
    num_r, num_i = ar - ctr, ai - cti
    den_r, den_i = ar + ctr, ai + cti
    dd = sqr(den_r) + sqr(den_i)
    dd = jnp.where(dd == 0, 1.0, dd)
    rp2 = (sqr(num_r) + sqr(num_i)) / dd
    # r_perp = (ci - eta_c cos_t) / (ci + eta_c cos_t)
    br = eta * ctr - k * cti
    bi = eta * cti + k * ctr
    num_r, num_i = ci - br, -bi
    den_r, den_i = ci + br, bi
    dd = sqr(den_r) + sqr(den_i)
    dd = jnp.where(dd == 0, 1.0, dd)
    rs2 = (sqr(num_r) + sqr(num_i)) / dd
    return (rp2 + rs2) / 2.0


def henyey_greenstein(cos_theta, g):
    """HG phase function (scattering.rs:231-242)."""
    g = jnp.clip(g, -0.99, 0.99)
    denom = 1.0 + sqr(g) + 2.0 * g * cos_theta
    return (
        (1.0 - sqr(g))
        / (denom * safe_sqrt(jnp.maximum(denom, 1e-9)) * 4.0 * jnp.pi)
    )


def sample_henyey_greenstein(wo, g, u):
    """Sample the HG phase function (scattering.rs:244-260).

    Returns (wi, pdf)."""
    from shimmer_tpu.ops.vecmath import Frame

    g = jnp.clip(g, -0.99, 0.99)
    gz = jnp.abs(g) > 1e-3
    sq = (1.0 - sqr(g)) / (1.0 + g - 2.0 * g * u[..., 0])
    ct_g = -(1.0 + sqr(g) - sqr(sq)) / (2.0 * g + jnp.where(gz, 0.0, 1.0))
    ct_iso = 1.0 - 2.0 * u[..., 0]
    ct = jnp.where(gz, ct_g, ct_iso)
    st = safe_sqrt(1.0 - sqr(ct))
    phi = 2.0 * jnp.pi * u[..., 1]
    frame = Frame.from_z(wo)
    wi = frame.from_local(
        vec(st * jnp.cos(phi), st * jnp.sin(phi), ct)
    )
    pdf = henyey_greenstein(ct, g)
    return wi, pdf
