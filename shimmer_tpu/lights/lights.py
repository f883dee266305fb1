"""Light sources as a flat SoA table.

TPU-native analog of /root/reference/src/light.rs.  All lights in a scene
live in one LightData table; sampling evaluates each light *kind* present
(a static property of the scene) for all lanes and selects by mask — the
wavefront replacement for the reference's enum dispatch.  Spot/distant
lights close gaps listed in SURVEY.md §2.1 (absent from the reference;
pbrt-v4 semantics).  Image-infinite lights live in env.py (they carry big
tables).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.math import safe_div, smooth_step, sqr
from shimmer_tpu.ops.vecmath import distance_squared, dot, normalize
from shimmer_tpu.shapes.sphere import (
    SphereData,
    sphere_pdf_with_context,
    sphere_sample_with_context,
)
from shimmer_tpu.ops.math import small_gather
from shimmer_tpu.spectra.spectrum import dense_sample, dense_sample_rows
from shimmer_tpu.utils.pytree import pytree_dataclass

# Light kinds.
POINT = 0
DISTANT = 1
SPOT = 2
AREA = 3
UNIFORM_INFINITE = 4
IMAGE_INFINITE = 5

# LightType classification (light.rs:1086-1108).
def is_delta_light(kind):
    return (kind == POINT) | (kind == DISTANT) | (kind == SPOT)


def is_infinite_light(kind):
    return (kind == UNIFORM_INFINITE) | (kind == IMAGE_INFINITE)


@pytree_dataclass
class LightData:
    kind: jnp.ndarray          # (L,) int32
    spectrum: jnp.ndarray      # (L, 471) dense emission spectrum
    scale: jnp.ndarray         # (L,)
    position: jnp.ndarray      # (L, 3) point/spot position; distant: unused
    direction: jnp.ndarray     # (L, 3) spot/distant direction (render space)
    cos_falloff_start: jnp.ndarray  # (L,)
    cos_falloff_end: jnp.ndarray    # (L,)
    shape_idx: jnp.ndarray     # (L,) int32 — area: index into sphere/tri table
    shape_kind: jnp.ndarray    # (L,) int32 — 0 sphere, 1 triangle,
    #                              2 bilinear patch
    two_sided: jnp.ndarray     # (L,) bool
    scene_radius: jnp.ndarray  # () — for infinite/distant pdf normalization


@pytree_dataclass
class LightLiSample:
    """light.rs:1045-1073 LightLiSample, batched."""

    l: jnp.ndarray       # (..., 4) radiance
    wi: jnp.ndarray      # (..., 3)
    pdf: jnp.ndarray     # (...,) solid-angle pdf (delta lights: 1)
    p_light: jnp.ndarray  # (..., 3)
    n_light: jnp.ndarray  # (..., 3)
    valid: jnp.ndarray   # (...,)
    is_delta: jnp.ndarray  # (...,)


def sample_li(
    lights: LightData,
    light_idx,
    ref_p,
    ref_ns,
    u,
    swl,
    spheres: SphereData | None,
    kinds_present: tuple,
    tri_sampler=None,
    env=None,
    patch_sampler=None,
) -> LightLiSample:
    """Sample incident direction from light ``light_idx`` per lane
    (LightI::sample_li, light.rs:21-82).

    kinds_present: static tuple of light kinds in the scene — only those
    branches are materialized in the trace.
    tri_sampler: optional callable (shape_idx, ref_p, ref_ns, u) →
    (p, n, pdf) for triangle-backed area lights.
    """
    kind = small_gather(lights.kind, light_idx)
    spec = dense_sample_rows(lights.spectrum, light_idx, swl.lam) * (
        small_gather(lights.scale, light_idx)[..., None]
    )
    batch = light_idx.shape

    out = LightLiSample(
        l=jnp.zeros(batch + (4,), jnp.float32),
        wi=jnp.zeros(batch + (3,), jnp.float32).at[..., 2].set(1.0),
        pdf=jnp.zeros(batch, jnp.float32),
        p_light=jnp.zeros(batch + (3,), jnp.float32),
        n_light=jnp.zeros(batch + (3,), jnp.float32),
        valid=jnp.zeros(batch, bool),
        is_delta=is_delta_light(kind),
    )

    def sel(mask, l, wi, pdf, p_light, n_light, valid, cur):
        m1 = mask[..., None]
        return LightLiSample(
            l=jnp.where(m1, l, cur.l),
            wi=jnp.where(m1, wi, cur.wi),
            pdf=jnp.where(mask, pdf, cur.pdf),
            p_light=jnp.where(m1, p_light, cur.p_light),
            n_light=jnp.where(m1, n_light, cur.n_light),
            valid=jnp.where(mask, valid, cur.valid),
            is_delta=cur.is_delta,
        )

    if POINT in kinds_present:
        m = kind == POINT
        p = small_gather(lights.position, light_idx)
        d2 = distance_squared(p, ref_p)
        wi = normalize(p - ref_p)
        # I / r^2 (light.rs:448-474)
        l = spec / jnp.maximum(d2, 1e-12)[..., None]
        out = sel(m, l, wi, jnp.ones(batch), p, -wi, d2 > 0.0, out)

    if SPOT in kinds_present:
        m = kind == SPOT
        p = small_gather(lights.position, light_idx)
        d2 = distance_squared(p, ref_p)
        wi = normalize(p - ref_p)
        # Smooth falloff between cone angles (pbrt-v4 SpotLight).
        cos_theta = dot(small_gather(lights.direction, light_idx), -wi)
        falloff = smooth_step(
            cos_theta,
            small_gather(lights.cos_falloff_end, light_idx),
            small_gather(lights.cos_falloff_start, light_idx),
        )
        l = spec * falloff[..., None] / jnp.maximum(d2, 1e-12)[..., None]
        out = sel(m, l, wi, jnp.ones(batch), p, -wi, (d2 > 0.0) & (falloff > 0.0), out)

    if DISTANT in kinds_present:
        m = kind == DISTANT
        wi = -small_gather(lights.direction, light_idx)
        p = ref_p + wi * (2.0 * lights.scene_radius)
        out = sel(m, spec, wi, jnp.ones(batch), p, -wi, jnp.ones(batch, bool), out)

    if AREA in kinds_present:
        m = kind == AREA
        sidx = small_gather(lights.shape_idx, light_idx)
        if spheres is not None:
            p, n, pdf = sphere_sample_with_context(
                spheres, sidx, ref_p, ref_ns, u
            )
            sm = m & (small_gather(lights.shape_kind, light_idx) == 0)
            wi = normalize(p - ref_p)
            emits = small_gather(lights.two_sided, light_idx) | (dot(n, -wi) > 0.0)
            l = jnp.where(emits[..., None], spec, 0.0)
            valid = (pdf > 0.0) & (distance_squared(p, ref_p) > 0.0) & emits
            out = sel(sm, l, wi, pdf, p, n, valid, out)
        if tri_sampler is not None:
            tm = m & (small_gather(lights.shape_kind, light_idx) == 1)
            p, n, pdf = tri_sampler(small_gather(lights.shape_idx, light_idx), ref_p, ref_ns, u)
            wi = normalize(p - ref_p)
            emits = small_gather(lights.two_sided, light_idx) | (dot(n, -wi) > 0.0)
            l = jnp.where(emits[..., None], spec, 0.0)
            valid = (pdf > 0.0) & (distance_squared(p, ref_p) > 0.0) & emits
            out = sel(tm, l, wi, pdf, p, n, valid, out)
        if patch_sampler is not None:
            pm = m & (small_gather(lights.shape_kind, light_idx) == 2)
            p, n, pdf = patch_sampler(
                small_gather(lights.shape_idx, light_idx), ref_p, ref_ns, u
            )
            wi = normalize(p - ref_p)
            emits = small_gather(lights.two_sided, light_idx) | (dot(n, -wi) > 0.0)
            l = jnp.where(emits[..., None], spec, 0.0)
            valid = (pdf > 0.0) & (distance_squared(p, ref_p) > 0.0) & emits
            out = sel(pm, l, wi, pdf, p, n, valid, out)

    if UNIFORM_INFINITE in kinds_present:
        from shimmer_tpu.ops.sampling import (
            UNIFORM_SPHERE_PDF,
            sample_uniform_sphere,
        )

        m = kind == UNIFORM_INFINITE
        wi = sample_uniform_sphere(u)
        p = ref_p + wi * (2.0 * lights.scene_radius)
        pdf = jnp.full(batch, UNIFORM_SPHERE_PDF, jnp.float32)
        out = sel(m, spec, wi, pdf, p, wi, jnp.ones(batch, bool), out)

    if IMAGE_INFINITE in kinds_present and env is not None:
        from shimmer_tpu.lights.env import env_sample_li

        m = kind == IMAGE_INFINITE
        l, wi, pdf, p = env_sample_li(env, ref_p, u, swl)
        out = sel(m, l, wi, pdf, p, wi, pdf > 0.0, out)

    return out


def pdf_li(
    lights: LightData,
    light_idx,
    ref_p,
    ref_ns,
    wi,
    si_p,
    si_n,
    spheres: SphereData | None,
    kinds_present: tuple,
    tri_pdf=None,
    env=None,
    patch_pdf=None,
):
    """Solid-angle pdf that sample_li would have produced direction wi
    (LightI::pdf_li).  For area lights the hit point si_p/si_n on the light
    is supplied (the MIS path has it from the BSDF-sampled intersection)."""
    kind = small_gather(lights.kind, light_idx)
    pdf = jnp.zeros(light_idx.shape, jnp.float32)
    if AREA in kinds_present and spheres is not None:
        m = kind == AREA
        p = sphere_pdf_with_context(
            spheres, small_gather(lights.shape_idx, light_idx), ref_p, wi, si_p, si_n
        )
        pdf = jnp.where(m & (small_gather(lights.shape_kind, light_idx) == 0), p, pdf)
    if AREA in kinds_present and tri_pdf is not None:
        m = (kind == AREA) & (small_gather(lights.shape_kind, light_idx) == 1)
        p = tri_pdf(small_gather(lights.shape_idx, light_idx), ref_p, ref_ns, wi, si_p, si_n)
        pdf = jnp.where(m, p, pdf)
    if AREA in kinds_present and patch_pdf is not None:
        m = (kind == AREA) & (small_gather(lights.shape_kind, light_idx) == 2)
        p = patch_pdf(
            small_gather(lights.shape_idx, light_idx), ref_p, ref_ns, wi, si_p, si_n
        )
        pdf = jnp.where(m, p, pdf)
    if UNIFORM_INFINITE in kinds_present:
        from shimmer_tpu.ops.sampling import UNIFORM_SPHERE_PDF

        pdf = jnp.where(
            kind == UNIFORM_INFINITE, UNIFORM_SPHERE_PDF, pdf
        )
    if IMAGE_INFINITE in kinds_present and env is not None:
        from shimmer_tpu.lights.env import env_pdf_li

        pdf = jnp.where(kind == IMAGE_INFINITE, env_pdf_li(env, wi), pdf)
    return pdf


def area_light_l(lights: LightData, light_idx, n, w, swl):
    """Emitted radiance from a point on an area light toward w
    (DiffuseAreaLight::l, light.rs:667-685)."""
    emits = small_gather(lights.two_sided, light_idx) | (dot(n, w) > 0.0)
    spec = dense_sample_rows(lights.spectrum, light_idx, swl.lam) * (
        small_gather(lights.scale, light_idx)[..., None]
    )
    return jnp.where(emits[..., None], spec, 0.0)


def infinite_le(
    lights: LightData,
    ray_d,
    swl,
    uniform_infinite_indices: tuple = (),
    image_infinite_indices: tuple = (),
    env_eval=None,
):
    """Sum of Le from infinite lights for escaped rays
    (UniformInfiniteLight::le, light.rs:748-760; ImageInfinite via env_eval).

    The infinite-light index lists are static host metadata (the scene knows
    its light census at build time), so only the present kinds trace."""
    total = jnp.zeros(ray_d.shape[:-1] + (4,), jnp.float32)
    for i in uniform_infinite_indices:
        spec = dense_sample(lights.spectrum[i], swl.lam) * lights.scale[i]
        total = total + spec
    for i in image_infinite_indices:
        total = total + env_eval(i, ray_d, swl)
    return total
