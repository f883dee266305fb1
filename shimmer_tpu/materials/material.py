"""Material table and wavefront BSDF dispatch.

TPU-native analog of /root/reference/src/material.rs + src/bsdf.rs.  Scene
materials are rows of a MaterialTable; the set of material *kinds* present
is static host metadata, so only those BxDF families are traced — the
wavefront-architecture replacement for enum dispatch (the reference itself
signposts this design for GPU use, material.rs:1351-1360).

The BSDF wrapper (shading-frame ↔ render-space conversion, bsdf.rs:12-112)
is implemented here as the render-space entry points ``bsdf_f`` /
``bsdf_sample`` / ``bsdf_pdf`` over SurfaceInteraction lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.math import small_gather
from shimmer_tpu.materials import bxdf as bx
from shimmer_tpu.materials.bxdf import BSDFSample, select_sample
from shimmer_tpu.ops.vecmath import dot, normalize
from shimmer_tpu.spectra.rgb2spec import sigmoid_poly_sample
from shimmer_tpu.utils.pytree import pytree_dataclass, static_field

# Material kinds (material.rs:100-108).
DIFFUSE = 0
CONDUCTOR = 1
DIELECTRIC = 2
THIN_DIELECTRIC = 3
COATED_DIFFUSE = 4
COATED_CONDUCTOR = 5
MIX = 6
DIFFUSE_TRANSMISSION = 7


@pytree_dataclass
class MaterialTable:
    """Flat per-material parameter arrays.  Texture-driven parameters are
    resolved to per-lane values by the texture stage before BSDF dispatch;
    the columns here are the constant-texture fallbacks."""

    kind: jnp.ndarray             # (M,) int32
    # diffuse / coated-diffuse reflectance (sigmoid coeffs)
    reflectance: jnp.ndarray      # (M, 3)
    # conductor: dense eta/k spectra indices into scene spectrum table
    eta_spec: jnp.ndarray         # (M,) int32 index, -1 = use float eta
    k_spec: jnp.ndarray           # (M,) int32
    # dielectric: scalar eta (or dense spectrum index for dispersion)
    eta_float: jnp.ndarray        # (M,)
    # roughness (GGX alpha after remap)
    uroughness: jnp.ndarray       # (M,)
    vroughness: jnp.ndarray       # (M,)
    # mix materials
    mix_amount: jnp.ndarray       # (M,)
    mix_m1: jnp.ndarray           # (M,) int32
    mix_m2: jnp.ndarray           # (M,) int32
    tex_mix_amount: jnp.ndarray   # (M,) int32 — float texture (-1 = const)
    # texture-driven parameters (-1 = use the constant column)
    tex_reflectance: jnp.ndarray  # (M,) int32
    tex_uroughness: jnp.ndarray   # (M,) int32
    tex_vroughness: jnp.ndarray   # (M,) int32
    # normal / bump maps
    normal_tex: jnp.ndarray       # (M,) int32 — tangent-space normal map
    displacement_tex: jnp.ndarray  # (M,) int32 — bump displacement
    # layered (coated) materials: interface layer params (bxdf.rs:883-937)
    thickness: jnp.ndarray        # (M,) layer optical thickness
    hg_g: jnp.ndarray             # (M,) HG asymmetry of the layer medium
    albedo: jnp.ndarray           # (M, 3) sigmoid coeffs of medium albedo
    bot_uroughness: jnp.ndarray   # (M,) bottom-interface roughness
    bot_vroughness: jnp.ndarray   # (M,)
    # dielectric with a *spectral* (dense-row) eta: hitting it collapses the
    # path to the hero wavelength (dispersion, material.rs:609-620,729-733)
    dispersive: jnp.ndarray       # (M,) bool
    # static: any Mix material with a textured amount?
    has_textured_mix: bool = static_field(default=False)
    # static: any layered material has a scattering medium (albedo != 0)?
    layer_medium: bool = static_field(default=False)
    # static: any dispersive dielectric present (gates the swl update)?
    has_dispersion: bool = static_field(default=False)


def make_material_table(mats: list[dict]) -> MaterialTable:
    """Host: build the table from material dicts."""
    m = len(mats)
    g = lambda k, d: np.array([mm.get(k, d) for mm in mats], np.float32)
    gi = lambda k, d: np.array([mm.get(k, d) for mm in mats], np.int32)
    refl = np.stack(
        [np.asarray(mm.get("reflectance_coeffs", [0.0, 0.0, 0.0]), np.float32) for mm in mats]
    ) if m else np.zeros((0, 3), np.float32)
    albedo = np.stack(
        [np.asarray(mm.get("albedo_coeffs", [0.0, 0.0, 0.0]), np.float32) for mm in mats]
    ) if m else np.zeros((0, 3), np.float32)
    kinds_arr = gi("kind", DIFFUSE)
    is_coated = (kinds_arr == COATED_DIFFUSE) | (kinds_arr == COATED_CONDUCTOR)
    layer_medium = bool(np.any(np.abs(albedo[is_coated]) > 0.0)) if m else False
    # Spectral-eta dielectrics are dispersive (constant-eta spectra are
    # stored as eta_float by the loaders, so eta_spec >= 0 ⇒ non-constant).
    dispersive = (
        (kinds_arr == DIELECTRIC) | (kinds_arr == THIN_DIELECTRIC)
    ) & (gi("eta_spec", -1) >= 0)
    return MaterialTable(
        kind=jnp.asarray(gi("kind", DIFFUSE)),
        reflectance=jnp.asarray(refl),
        eta_spec=jnp.asarray(gi("eta_spec", -1)),
        k_spec=jnp.asarray(gi("k_spec", -1)),
        eta_float=jnp.asarray(g("eta_float", 1.5)),
        uroughness=jnp.asarray(g("uroughness", 0.0)),
        vroughness=jnp.asarray(g("vroughness", 0.0)),
        mix_amount=jnp.asarray(g("mix_amount", 0.5)),
        mix_m1=jnp.asarray(gi("mix_m1", 0)),
        mix_m2=jnp.asarray(gi("mix_m2", 0)),
        tex_mix_amount=jnp.asarray(gi("tex_mix_amount", -1)),
        has_textured_mix=bool(np.any(gi("tex_mix_amount", -1) >= 0))
        if m else False,
        tex_reflectance=jnp.asarray(gi("tex_reflectance", -1)),
        tex_uroughness=jnp.asarray(gi("tex_uroughness", -1)),
        tex_vroughness=jnp.asarray(gi("tex_vroughness", -1)),
        normal_tex=jnp.asarray(gi("normal_tex", -1)),
        displacement_tex=jnp.asarray(gi("displacement_tex", -1)),
        thickness=jnp.asarray(g("thickness", 0.01)),
        hg_g=jnp.asarray(g("g", 0.0)),
        albedo=jnp.asarray(albedo),
        bot_uroughness=jnp.asarray(g("bot_uroughness", 0.0)),
        bot_vroughness=jnp.asarray(g("bot_vroughness", 0.0)),
        dispersive=jnp.asarray(dispersive),
        layer_medium=layer_medium,
        has_dispersion=bool(np.any(dispersive)) if m else False,
    )


def resolve_mix(
    materials: MaterialTable, kinds_present: tuple, mat_id, u,
    amt_override=None,
):
    """Stochastically resolve Mix materials to a concrete material id
    (material.rs:1309-1330): pick m1 with probability ``amount``.  Two
    resolution rounds handle a mix that itself points at a mix.

    amt_override: optional per-lane amount (a FloatTexture evaluated at
    the intersection, material.rs:1312) applied to the first round; a
    nested mix falls back to its scalar column."""
    if MIX not in kinds_present:
        return mat_id
    for round_i in range(2):
        is_mix = small_gather(materials.kind, mat_id) == MIX
        amt = small_gather(materials.mix_amount, mat_id)
        if round_i == 0 and amt_override is not None:
            amt = amt_override
        chosen = jnp.where(
            u < amt, small_gather(materials.mix_m1, mat_id), small_gather(materials.mix_m2, mat_id)
        )
        mat_id = jnp.where(is_mix, chosen, mat_id)
    return mat_id


def resolved_kinds(kinds_present: tuple) -> tuple:
    """Kinds that can reach BSDF dispatch after Mix resolution."""
    return tuple(k for k in kinds_present if k != MIX)


def _local_dirs(frame, *ws):
    return tuple(frame.to_local(w) for w in ws)


def _diffuse_reflectance(materials, mat_id, swl, tex_reflectance=None):
    if tex_reflectance is not None:
        return tex_reflectance
    coeffs = small_gather(materials.reflectance, mat_id)
    return sigmoid_poly_sample(coeffs, swl.lam)


def bsdf_f(
    materials: MaterialTable,
    kinds_present: tuple,
    mat_id,
    frame,
    ns,
    wo_render,
    wi_render,
    swl,
    tex=None,
    spectra_table=None,
    rng_key=None,
):
    """Render-space BSDF evaluation over lanes (BSDF::f, bsdf.rs:31-42)."""
    wo, wi = _local_dirs(frame, wo_render, wi_render)
    kind = small_gather(materials.kind, mat_id)
    f = jnp.zeros(wo.shape[:-1] + (4,), jnp.float32)
    degenerate = (jnp.abs(wo[..., 2]) < 1e-9)
    if DIFFUSE in kinds_present:
        refl = _diffuse_reflectance(
            materials, mat_id, swl, (tex or {}).get("reflectance")
        )
        f = jnp.where((kind == DIFFUSE)[..., None], bx.diffuse_f(refl, wo, wi), f)
    if CONDUCTOR in kinds_present or DIELECTRIC in kinds_present:
        from shimmer_tpu.materials import conductor_dielectric as cd

        f = cd.rough_f(
            materials, kinds_present, mat_id, kind, wo, wi, swl, f,
            tex=tex, spectra_table=spectra_table,
        )
    if COATED_DIFFUSE in kinds_present or COATED_CONDUCTOR in kinds_present:
        from shimmer_tpu.materials import layered

        key = rng_key if rng_key is not None else jnp.zeros(wo.shape[:-1], jnp.uint32)
        f = layered.coated_f(
            materials, kinds_present, mat_id, kind, wo, wi, swl, f, key,
            tex=tex, spectra_table=spectra_table,
        )
    return jnp.where(degenerate[..., None], 0.0, f)


def bsdf_sample(
    materials: MaterialTable,
    kinds_present: tuple,
    mat_id,
    frame,
    ns,
    wo_render,
    u2,
    uc,
    swl,
    tex=None,
    spectra_table=None,
    rng_key=None,
) -> BSDFSample:
    """Render-space BSDF sampling (BSDF::sample_f, bsdf.rs:60-82).

    Returns the sample with ``wi`` converted back to render space."""
    wo = frame.to_local(wo_render)
    kind = small_gather(materials.kind, mat_id)
    batch = wo.shape[:-1]
    out = BSDFSample.invalid(batch)
    if DIFFUSE in kinds_present:
        refl = _diffuse_reflectance(
            materials, mat_id, swl, (tex or {}).get("reflectance")
        )
        s = bx.diffuse_sample_f(refl, wo, u2, uc)
        out = select_sample(kind == DIFFUSE, s, out)
    if CONDUCTOR in kinds_present or DIELECTRIC in kinds_present or THIN_DIELECTRIC in kinds_present:
        from shimmer_tpu.materials import conductor_dielectric as cd

        out = cd.rough_sample(
            materials, kinds_present, mat_id, kind, wo, u2, uc, swl, out,
            tex=tex, spectra_table=spectra_table,
        )
    if COATED_DIFFUSE in kinds_present or COATED_CONDUCTOR in kinds_present:
        from shimmer_tpu.materials import layered

        key = rng_key if rng_key is not None else jnp.zeros(batch, jnp.uint32)
        out = layered.coated_sample(
            materials, kinds_present, mat_id, kind, wo, u2, uc, swl, out, key,
            tex=tex, spectra_table=spectra_table,
        )
    degenerate = jnp.abs(wo[..., 2]) < 1e-9
    wi_render = frame.from_local(out.wi)
    return BSDFSample(
        f=out.f,
        wi=wi_render,
        pdf=out.pdf,
        flags=out.flags,
        eta=out.eta,
        pdf_is_proportional=out.pdf_is_proportional,
        valid=out.valid & ~degenerate & (out.pdf > 0.0),
    )


def bsdf_pdf(
    materials: MaterialTable,
    kinds_present: tuple,
    mat_id,
    frame,
    ns,
    wo_render,
    wi_render,
    swl,
    tex=None,
    spectra_table=None,
    rng_key=None,
):
    """Render-space BSDF pdf (BSDF::pdf, bsdf.rs:84-95)."""
    wo, wi = _local_dirs(frame, wo_render, wi_render)
    kind = small_gather(materials.kind, mat_id)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)
    if DIFFUSE in kinds_present:
        pdf = jnp.where(kind == DIFFUSE, bx.diffuse_pdf(wo, wi), pdf)
    if CONDUCTOR in kinds_present or DIELECTRIC in kinds_present:
        from shimmer_tpu.materials import conductor_dielectric as cd

        pdf = cd.rough_pdf(
            materials, kinds_present, mat_id, kind, wo, wi, swl, pdf,
            tex=tex, spectra_table=spectra_table,
        )
    if COATED_DIFFUSE in kinds_present or COATED_CONDUCTOR in kinds_present:
        from shimmer_tpu.materials import layered

        key = rng_key if rng_key is not None else jnp.zeros(wo.shape[:-1], jnp.uint32)
        pdf = layered.coated_pdf(
            materials, kinds_present, mat_id, kind, wo, wi, swl, pdf, key,
            tex=tex, spectra_table=spectra_table,
        )
    return jnp.where(jnp.abs(wo[..., 2]) < 1e-9, 0.0, pdf)


def bsdf_rho_hd(
    materials, kinds_present, mat_id, frame, ns, wo_render, swl,
    uc, u2, **ctx,
):
    """Hemispherical-directional reflectance rho_hd (bxdf.rs:49-71,
    pbrt-v4 eq. 4.12): MC estimate over the provided sample arrays.

    uc: (S, ...) 1d samples; u2: (S, ..., 2).  Returns (..., 4)."""
    s_count = uc.shape[0]
    r = jnp.zeros(wo_render.shape[:-1] + (4,), jnp.float32)
    for i in range(s_count):
        bs = bsdf_sample(
            materials, kinds_present, mat_id, frame, ns, wo_render,
            u2[i], uc[i], swl, **ctx,
        )
        cos_i = jnp.abs(frame.to_local(bs.wi)[..., 2])
        ok = bs.valid & (bs.pdf > 0.0)
        r = r + jnp.where(
            ok[..., None],
            bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-20))[..., None],
            0.0,
        )
    return r / float(s_count)


def bsdf_rho_hh(
    materials, kinds_present, mat_id, frame, ns, swl, u1, uc, u2, **ctx,
):
    """Hemispherical-hemispherical reflectance rho_hh (bxdf.rs:73-93,
    pbrt-v4 eq. 4.13): wo drawn uniformly from the hemisphere around the
    shading normal, then the rho_hd inner estimate.

    u1: (S, ..., 2) hemisphere draws; uc/u2 as in bsdf_rho_hd."""
    from shimmer_tpu.ops.sampling import (
        UNIFORM_HEMISPHERE_PDF,
        sample_uniform_hemisphere,
    )

    s_count = uc.shape[0]
    r = jnp.zeros(u1.shape[1:-1] + (4,), jnp.float32)
    for i in range(s_count):
        wo_local = sample_uniform_hemisphere(u1[i])
        wo_render = frame.from_local(wo_local)
        bs = bsdf_sample(
            materials, kinds_present, mat_id, frame, ns, wo_render,
            u2[i], uc[i], swl, **ctx,
        )
        cos_i = jnp.abs(frame.to_local(bs.wi)[..., 2])
        cos_o = jnp.abs(wo_local[..., 2])
        ok = bs.valid & (bs.pdf > 0.0) & (cos_o > 0.0)
        w = cos_i * cos_o / (UNIFORM_HEMISPHERE_PDF * jnp.maximum(bs.pdf, 1e-20))
        r = r + jnp.where(ok[..., None], bs.f * w[..., None], 0.0)
    return r / (float(s_count) * jnp.pi)
