"""Conductor, dielectric and thin-dielectric BxDFs (smooth + rough).

TPU-native analog of /root/reference/src/bxdf.rs: ConductorBxDF
(:328-458), DielectricBxDF (:518-795), ThinDielectricBxDF (:797-881).
Everything is batched over lanes in the local shading frame; the
effectively-smooth specular case and the rough microfacet case are both
evaluated and masked per lane (the wavefront replacement for the
reference's runtime branch).

Spectral conductor IORs (eta, k per hero wavelength) come from the scene's
shared dense-spectrum table; the reflectance parameterization converts to
(eta=1, k = 2 sqrt(R)/sqrt(1-R)) like pbrt.  Dielectric eta is scalar per
lane (the dispersion path samples it at the hero wavelength after
``terminate_secondary``).
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.math import small_gather
from shimmer_tpu.materials import bxdf as bx
from shimmer_tpu.materials.bxdf import BSDFSample, select_sample
from shimmer_tpu.materials import scattering as sc
from shimmer_tpu.ops.math import safe_div, safe_sqrt, sqr
from shimmer_tpu.ops.vecmath import (
    abs_cos_theta,
    abs_dot,
    cos_theta,
    dot,
    normalize,
    same_hemisphere,
)
from shimmer_tpu.spectra.rgb2spec import sigmoid_poly_sample
from shimmer_tpu.spectra.spectrum import dense_sample, dense_sample_rows


def _material_alphas(materials, mat_id, tex):
    ax = small_gather(materials.uroughness, mat_id)
    ay = small_gather(materials.vroughness, mat_id)
    if tex:
        if tex.get("uroughness") is not None:
            ax = tex["uroughness"]
        if tex.get("vroughness") is not None:
            ay = tex["vroughness"]
    ax = sc.roughness_to_alpha(ax)
    ay = sc.roughness_to_alpha(ay)
    if tex and tex.get("regularize") is not None:
        reg = tex["regularize"]
        ax = jnp.where(reg, sc.regularize_alpha(ax), ax)
        ay = jnp.where(reg, sc.regularize_alpha(ay), ay)
    return sc.clamp_alpha(ax, ay)


def _conductor_eta_k(materials, mat_id, swl, spectra_table, tex):
    """Per-wavelength (eta, k): dense-spectrum rows or reflectance mode."""
    eta_idx = small_gather(materials.eta_spec, mat_id)
    k_idx = small_gather(materials.k_spec, mat_id)
    use_spec = eta_idx >= 0
    if spectra_table is not None:
        eta_s = dense_sample_rows(
            spectra_table, jnp.maximum(eta_idx, 0), swl.lam
        )
        k_s = dense_sample_rows(spectra_table, jnp.maximum(k_idx, 0), swl.lam)
    else:
        eta_s = jnp.ones(swl.lam.shape)
        k_s = jnp.ones(swl.lam.shape)
    # Reflectance mode: eta=1, k = 2 sqrt(R) / sqrt(1 - R) (pbrt).
    if tex and tex.get("reflectance") is not None:
        refl = tex["reflectance"]
    else:
        refl = sigmoid_poly_sample(small_gather(materials.reflectance, mat_id), swl.lam)
    refl = jnp.clip(refl, 0.0, 0.9999)
    k_r = 2.0 * jnp.sqrt(refl) / safe_sqrt(1.0 - refl)
    eta = jnp.where(use_spec[..., None], eta_s, 1.0)
    k = jnp.where(use_spec[..., None], k_s, k_r)
    return eta, k


def _dielectric_eta(materials, mat_id, swl, spectra_table):
    """Scalar relative IOR per lane; spectral etas use the hero wavelength
    (dispersion requires terminate_secondary upstream)."""
    eta_idx = small_gather(materials.eta_spec, mat_id)
    eta_f = small_gather(materials.eta_float, mat_id)
    if spectra_table is not None:
        eta_s = dense_sample_rows(
            spectra_table, jnp.maximum(eta_idx, 0), swl.lam
        )[..., 0]
        return jnp.where(eta_idx >= 0, eta_s, eta_f)
    return eta_f


# --- conductor (bxdf.rs:328-458) ---


def conductor_f(eta, k, wo, wi, ax, ay):
    smooth = sc.effectively_smooth(ax, ay)
    same = same_hemisphere(wo, wi)
    cos_o = abs_cos_theta(wo)
    cos_i = abs_cos_theta(wi)
    wm = wi + wo
    wm_ok = jnp.sum(wm * wm, -1) > 1e-18
    wm = normalize(jnp.where(wm_ok[..., None], wm, jnp.array([0.0, 0.0, 1.0])))
    fr = sc.fresnel_complex(abs_dot(wo, wm)[..., None], eta, k)
    d = sc.tr_d(wm, ax, ay)
    g = sc.tr_g(wo, wi, ax, ay)
    denom = jnp.maximum(4.0 * cos_o * cos_i, 1e-9)
    f = (d * g / denom)[..., None] * fr
    ok = same & ~smooth & wm_ok & (cos_o > 1e-9) & (cos_i > 1e-9)
    return jnp.where(ok[..., None], f, 0.0)


def conductor_sample(eta, k, wo, u2, ax, ay):
    batch = wo.shape[:-1]
    smooth = sc.effectively_smooth(ax, ay)
    # smooth: perfect mirror
    wi_s = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    cos_i_s = jnp.maximum(abs_cos_theta(wi_s), 1e-9)
    f_s = sc.fresnel_complex(cos_i_s[..., None], eta, k) / cos_i_s[..., None]
    smooth_sample = BSDFSample(
        f=f_s,
        wi=wi_s,
        pdf=jnp.ones(batch, jnp.float32),
        flags=jnp.full(batch, bx.SPECULAR_REFLECTION, jnp.int32),
        eta=jnp.ones(batch, jnp.float32),
        pdf_is_proportional=jnp.zeros(batch, bool),
        valid=abs_cos_theta(wo) > 1e-9,
    )
    # rough: visible-normal sampling
    wm = sc.tr_sample_wm(wo, u2, ax, ay)
    wi = sc.reflect(wo, wm)
    same = same_hemisphere(wo, wi)
    pdf = sc.tr_pdf(wo, wm, ax, ay) / jnp.maximum(
        4.0 * abs_dot(wo, wm), 1e-9
    )
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-9)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-9)
    fr = sc.fresnel_complex(abs_dot(wo, wm)[..., None], eta, k)
    d = sc.tr_d(wm, ax, ay)
    g = sc.tr_g(wo, wi, ax, ay)
    f = (d * g / (4.0 * cos_o * cos_i))[..., None] * fr
    rough_sample_ = BSDFSample(
        f=f,
        wi=wi,
        pdf=pdf,
        flags=jnp.full(batch, bx.GLOSSY_REFLECTION, jnp.int32),
        eta=jnp.ones(batch, jnp.float32),
        pdf_is_proportional=jnp.zeros(batch, bool),
        valid=same & (pdf > 0.0),
    )
    return select_sample(smooth, smooth_sample, rough_sample_)


def conductor_pdf(wo, wi, ax, ay):
    smooth = sc.effectively_smooth(ax, ay)
    same = same_hemisphere(wo, wi)
    wm = wi + wo
    wm_ok = jnp.sum(wm * wm, -1) > 1e-18
    wm = normalize(jnp.where(wm_ok[..., None], wm, jnp.array([0.0, 0.0, 1.0])))
    wm = jnp.where((wm[..., 2] < 0)[..., None], -wm, wm)
    pdf = sc.tr_pdf(wo, wm, ax, ay) / jnp.maximum(4.0 * abs_dot(wo, wm), 1e-9)
    return jnp.where(same & ~smooth & wm_ok, pdf, 0.0)


# --- dielectric (bxdf.rs:518-795) ---


def dielectric_f(eta, wo, wi, ax, ay, radiance=True):
    """Rough dielectric evaluation.  ``radiance`` selects the transport
    mode: radiance transport applies the 1/etap^2 non-symmetry factor,
    importance transport omits it (bxdf.rs:614-620 / pbrt TransportMode)."""
    smooth = sc.effectively_smooth(ax, ay)
    eta_one = jnp.abs(eta - 1.0) < 1e-6
    cos_o = cos_theta(wo)
    cos_i = cos_theta(wi)
    reflect_case = cos_i * cos_o > 0.0
    etap = jnp.where(reflect_case, 1.0, jnp.where(cos_o > 0, eta, 1.0 / eta))
    wm = wi * etap[..., None] + wo
    wm_ok = jnp.sum(wm * wm, -1) > 1e-18
    wm = normalize(jnp.where(wm_ok[..., None], wm, jnp.array([0.0, 0.0, 1.0])))
    wm = jnp.where((wm[..., 2] < 0.0)[..., None], -wm, wm)
    # discard backfacing microfacets
    front = (dot(wm, wi) * cos_i >= 0.0) & (dot(wm, wo) * cos_o >= 0.0)
    fr = sc.fresnel_dielectric(dot(wo, wm), eta)
    d = sc.tr_d(wm, ax, ay)
    g = sc.tr_g(wo, wi, ax, ay)
    denom_r = jnp.maximum(jnp.abs(cos_i * cos_o), 1e-9)
    f_reflect = d * fr * g / (4.0 * denom_r)
    denom_t = sqr(dot(wi, wm) + dot(wo, wm) / etap)
    denom_t = jnp.where(denom_t < 1e-12, 1.0, denom_t)
    f_transmit = (
        d
        * (1.0 - fr)
        * g
        * jnp.abs(
            dot(wi, wm) * dot(wo, wm) / (cos_i * cos_o * denom_t)
        )
        / (sqr(etap) if radiance else 1.0)  # radiance transport factor
    )
    f = jnp.where(reflect_case, f_reflect, f_transmit)
    ok = ~smooth & ~eta_one & wm_ok & front & (jnp.abs(cos_i) > 1e-9) & (
        jnp.abs(cos_o) > 1e-9
    )
    return jnp.where(ok, f, 0.0)[..., None] * jnp.ones(4)


def dielectric_sample(eta, wo, u2, uc, ax, ay, sample_flags=bx.SAMPLE_ALL, radiance=True):
    batch = wo.shape[:-1]
    smooth = sc.effectively_smooth(ax, ay)
    allow_r = bool(sample_flags & bx.SAMPLE_REFLECTION)
    allow_t = bool(sample_flags & bx.SAMPLE_TRANSMISSION)

    def mk(f, wi, pdf, flags, eta_s, valid):
        return BSDFSample(
            f=f * jnp.ones(4),
            wi=wi,
            pdf=pdf,
            flags=flags,
            eta=eta_s,
            pdf_is_proportional=jnp.zeros(batch, bool),
            valid=valid,
        )

    # ---- smooth specular case (bxdf.rs:560-640) ----
    fr_s = sc.fresnel_dielectric(cos_theta(wo), eta)
    pr = jnp.where(allow_r, fr_s, 0.0)
    pt = jnp.where(allow_t, 1.0 - fr_s, 0.0)
    total = pr + pt
    choose_r = uc < safe_div(pr, total)
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    cos_r = jnp.maximum(abs_cos_theta(wi_r), 1e-9)
    f_r = (fr_s / cos_r)[..., None]
    pdf_r = safe_div(pr, total)
    n_local = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), wo.shape)
    wt, etap_t, t_ok = sc.refract(wo, n_local, eta)
    cos_t = jnp.maximum(abs_cos_theta(wt), 1e-9)
    # radiance mode: scale by 1/etap^2 (bxdf.rs:614-620)
    f_t = ((1.0 - fr_s) / cos_t / (sqr(etap_t) if radiance else 1.0))[..., None]
    pdf_t = safe_div(pt, total)
    smooth_sample = select_sample(
        choose_r,
        mk(
            f_r, wi_r, pdf_r,
            jnp.full(batch, bx.SPECULAR_REFLECTION, jnp.int32),
            jnp.ones(batch), (total > 0.0) & (pr > 0.0),
        ),
        mk(
            f_t, wt, pdf_t,
            jnp.full(batch, bx.SPECULAR_TRANSMISSION, jnp.int32),
            etap_t, (total > 0.0) & (pt > 0.0) & t_ok,
        ),
    )

    # ---- rough microfacet case (bxdf.rs:642-740) ----
    wm = sc.tr_sample_wm(wo, u2, ax, ay)
    fr_m = sc.fresnel_dielectric(dot(wo, wm), eta)
    pr_m = jnp.where(allow_r, fr_m, 0.0)
    pt_m = jnp.where(allow_t, 1.0 - fr_m, 0.0)
    total_m = pr_m + pt_m
    choose_rm = uc < safe_div(pr_m, total_m)
    # reflect branch
    wi_rm = sc.reflect(wo, wm)
    same_rm = same_hemisphere(wo, wi_rm)
    cos_o = cos_theta(wo)
    cos_i_rm = cos_theta(wi_rm)
    d = sc.tr_d(wm, ax, ay)
    g_rm = sc.tr_g(wo, wi_rm, ax, ay)
    pdf_rm = (
        sc.tr_pdf(wo, wm, ax, ay)
        / jnp.maximum(4.0 * abs_dot(wo, wm), 1e-9)
        * safe_div(pr_m, total_m)
    )
    f_rm = (
        d * g_rm * fr_m
        / jnp.maximum(jnp.abs(4.0 * cos_i_rm * cos_o), 1e-9)
    )[..., None]
    # transmit branch
    wt_m, etap_m, t_ok_m = sc.refract(wo, wm, eta)
    cos_i_tm = cos_theta(wt_m)
    diff_hemi = ~same_hemisphere(wo, wt_m)
    denom = sqr(dot(wt_m, wm) + dot(wo, wm) / etap_m)
    denom_ok = denom > 1e-12
    denom = jnp.where(denom_ok, denom, 1.0)
    dwm_dwi = abs_dot(wt_m, wm) / denom
    g_tm = sc.tr_g(wo, wt_m, ax, ay)
    pdf_tm = sc.tr_pdf(wo, wm, ax, ay) * dwm_dwi * safe_div(pt_m, total_m)
    f_tm = (
        d
        * (1.0 - fr_m)
        * g_tm
        * jnp.abs(
            dot(wt_m, wm)
            * dot(wo, wm)
            / (cos_i_tm * cos_o * denom)
        )
        / (sqr(etap_m) if radiance else 1.0)
    )[..., None]
    rough = select_sample(
        choose_rm,
        mk(
            f_rm, wi_rm, pdf_rm,
            jnp.full(batch, bx.GLOSSY_REFLECTION, jnp.int32),
            jnp.ones(batch),
            (total_m > 0.0) & same_rm & (pdf_rm > 0.0),
        ),
        mk(
            f_tm, wt_m, pdf_tm,
            jnp.full(batch, bx.GLOSSY_TRANSMISSION, jnp.int32),
            etap_m,
            (total_m > 0.0) & t_ok_m & diff_hemi & denom_ok & (pdf_tm > 0.0),
        ),
    )

    # eta == 1 is always a pass-through specular transmission.
    eta_one = jnp.abs(eta - 1.0) < 1e-6
    pass_through = mk(
        (1.0 / jnp.maximum(abs_cos_theta(-wo), 1e-9))[..., None],
        -wo,
        jnp.ones(batch),
        jnp.full(batch, bx.SPECULAR_TRANSMISSION, jnp.int32),
        jnp.ones(batch),
        jnp.full(batch, allow_t, bool),
    )
    out = select_sample(smooth, smooth_sample, rough)
    return select_sample(eta_one, pass_through, out)


def dielectric_pdf(eta, wo, wi, ax, ay, sample_flags=bx.SAMPLE_ALL):
    smooth = sc.effectively_smooth(ax, ay)
    eta_one = jnp.abs(eta - 1.0) < 1e-6
    cos_o = cos_theta(wo)
    cos_i = cos_theta(wi)
    reflect_case = cos_i * cos_o > 0.0
    etap = jnp.where(reflect_case, 1.0, jnp.where(cos_o > 0, eta, 1.0 / eta))
    wm = wi * etap[..., None] + wo
    wm_ok = jnp.sum(wm * wm, -1) > 1e-18
    wm = normalize(jnp.where(wm_ok[..., None], wm, jnp.array([0.0, 0.0, 1.0])))
    wm = jnp.where((wm[..., 2] < 0.0)[..., None], -wm, wm)
    front = (dot(wm, wi) * cos_i >= 0.0) & (dot(wm, wo) * cos_o >= 0.0)
    fr = sc.fresnel_dielectric(dot(wo, wm), eta)
    allow_r = bool(sample_flags & bx.SAMPLE_REFLECTION)
    allow_t = bool(sample_flags & bx.SAMPLE_TRANSMISSION)
    pr = jnp.where(allow_r, fr, 0.0)
    pt = jnp.where(allow_t, 1.0 - fr, 0.0)
    total = pr + pt
    pdf_r = (
        sc.tr_pdf(wo, wm, ax, ay)
        / jnp.maximum(4.0 * abs_dot(wo, wm), 1e-9)
        * safe_div(pr, total)
    )
    denom = sqr(dot(wi, wm) + dot(wo, wm) / etap)
    denom_ok = denom > 1e-12
    denom = jnp.where(denom_ok, denom, 1.0)
    dwm_dwi = abs_dot(wi, wm) / denom
    pdf_t = sc.tr_pdf(wo, wm, ax, ay) * dwm_dwi * safe_div(pt, total)
    pdf = jnp.where(reflect_case, pdf_r, jnp.where(denom_ok, pdf_t, 0.0))
    return jnp.where(smooth | eta_one | ~wm_ok | ~front, 0.0, pdf)


# --- thin dielectric (bxdf.rs:797-881) ---


def thin_dielectric_sample(eta, wo, uc, sample_flags=bx.SAMPLE_ALL):
    batch = wo.shape[:-1]
    r = sc.fresnel_dielectric(abs_cos_theta(wo), eta)
    # double-interface reflectance (bxdf.rs:818-824)
    r = jnp.where(r < 1.0, r + sqr(1.0 - r) * r / (1.0 - sqr(r)), 1.0)
    t = 1.0 - r
    allow_r = bool(sample_flags & bx.SAMPLE_REFLECTION)
    allow_t = bool(sample_flags & bx.SAMPLE_TRANSMISSION)
    pr = jnp.where(allow_r, r, 0.0)
    pt = jnp.where(allow_t, t, 0.0)
    total = pr + pt
    choose_r = uc < safe_div(pr, total)
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    cos_r = jnp.maximum(abs_cos_theta(wi_r), 1e-9)

    def mk(f, wi, pdf, flags, valid):
        return BSDFSample(
            f=f * jnp.ones(4),
            wi=wi,
            pdf=pdf,
            flags=flags,
            eta=jnp.ones(batch),
            pdf_is_proportional=jnp.zeros(batch, bool),
            valid=valid,
        )

    return select_sample(
        choose_r,
        mk(
            (r / cos_r)[..., None], wi_r, safe_div(pr, total),
            jnp.full(batch, bx.SPECULAR_REFLECTION, jnp.int32),
            (total > 0.0) & (pr > 0.0),
        ),
        mk(
            (t / jnp.maximum(abs_cos_theta(wo), 1e-9))[..., None],
            -wo,
            safe_div(pt, total),
            jnp.full(batch, bx.SPECULAR_TRANSMISSION, jnp.int32),
            (total > 0.0) & (pt > 0.0),
        ),
    )


# --- dispatch glue used by materials.material ---


def rough_f(materials, kinds_present, mat_id, kind, wo, wi, swl, f, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    if mtl.CONDUCTOR in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        eta, k = _conductor_eta_k(materials, mat_id, swl, spectra_table, tex)
        f = jnp.where(
            (kind == mtl.CONDUCTOR)[..., None],
            conductor_f(eta, k, wo, wi, ax, ay),
            f,
        )
    if mtl.DIELECTRIC in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        eta = _dielectric_eta(materials, mat_id, swl, spectra_table)
        f = jnp.where(
            (kind == mtl.DIELECTRIC)[..., None],
            dielectric_f(eta, wo, wi, ax, ay),
            f,
        )
    # THIN_DIELECTRIC is purely specular: f() == 0.
    return f


def rough_sample(materials, kinds_present, mat_id, kind, wo, u2, uc, swl, out, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    if mtl.CONDUCTOR in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        eta, k = _conductor_eta_k(materials, mat_id, swl, spectra_table, tex)
        s = conductor_sample(eta, k, wo, u2, ax, ay)
        out = select_sample(kind == mtl.CONDUCTOR, s, out)
    if mtl.DIELECTRIC in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        eta = _dielectric_eta(materials, mat_id, swl, spectra_table)
        s = dielectric_sample(eta, wo, u2, uc, ax, ay)
        out = select_sample(kind == mtl.DIELECTRIC, s, out)
    if mtl.THIN_DIELECTRIC in kinds_present:
        eta = _dielectric_eta(materials, mat_id, swl, spectra_table)
        s = thin_dielectric_sample(eta, wo, uc)
        out = select_sample(kind == mtl.THIN_DIELECTRIC, s, out)
    return out


def rough_pdf(materials, kinds_present, mat_id, kind, wo, wi, swl, pdf, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    if mtl.CONDUCTOR in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        pdf = jnp.where(
            kind == mtl.CONDUCTOR, conductor_pdf(wo, wi, ax, ay), pdf
        )
    if mtl.DIELECTRIC in kinds_present:
        ax, ay = _material_alphas(materials, mat_id, tex)
        eta = _dielectric_eta(materials, mat_id, swl, spectra_table)
        pdf = jnp.where(
            kind == mtl.DIELECTRIC, dielectric_pdf(eta, wo, wi, ax, ay), pdf
        )
    # thin dielectric: specular only → pdf 0
    return pdf
