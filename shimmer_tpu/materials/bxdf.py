"""BxDF core: flags, sample records, and the Lambertian diffuse BxDF.

TPU-native analog of /root/reference/src/bxdf.rs.  BxDFs are *functions over
parameter arrays* evaluated in the local shading frame (z = shading normal):
instead of the reference's enum dispatch per ray, each BxDF family present
in a scene is evaluated for all lanes and selected by mask — the wavefront
architecture's material stages.  Conductor/dielectric/thin/layered live in
sibling modules.
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.sampling import (
    INV_PI,
    cosine_hemisphere_pdf,
    sample_cosine_hemisphere,
)
from shimmer_tpu.ops.vecmath import abs_cos_theta, same_hemisphere
from shimmer_tpu.spectra.sampled import N_SPECTRUM_SAMPLES
from shimmer_tpu.utils.pytree import pytree_dataclass

# BxDF flags (bxdf.rs:1773-1829).
REFLECTION = 1
TRANSMISSION = 2
DIFFUSE = 4
GLOSSY = 8
SPECULAR = 16
DIFFUSE_REFLECTION = DIFFUSE | REFLECTION
DIFFUSE_TRANSMISSION = DIFFUSE | TRANSMISSION
GLOSSY_REFLECTION = GLOSSY | REFLECTION
GLOSSY_TRANSMISSION = GLOSSY | TRANSMISSION
SPECULAR_REFLECTION = SPECULAR | REFLECTION
SPECULAR_TRANSMISSION = SPECULAR | TRANSMISSION
ALL = REFLECTION | TRANSMISSION | DIFFUSE | GLOSSY | SPECULAR

# Sample-request flags (BxDFReflTransFlags).
SAMPLE_REFLECTION = 1
SAMPLE_TRANSMISSION = 2
SAMPLE_ALL = SAMPLE_REFLECTION | SAMPLE_TRANSMISSION


def flags_is_specular(flags):
    return (flags & SPECULAR) != 0


def flags_is_transmissive(flags):
    return (flags & TRANSMISSION) != 0


def flags_is_diffuse(flags):
    return (flags & DIFFUSE) != 0


def flags_is_non_specular(flags):
    return (flags & (DIFFUSE | GLOSSY)) != 0


@pytree_dataclass
class BSDFSample:
    """bxdf.rs:1702-1765 BSDFSample, batched."""

    f: jnp.ndarray       # (..., 4)
    wi: jnp.ndarray      # (..., 3)
    pdf: jnp.ndarray     # (...,)
    flags: jnp.ndarray   # (...,) int32
    eta: jnp.ndarray     # (...,) relative IOR carried by this sample
    pdf_is_proportional: jnp.ndarray  # (...,) bool
    valid: jnp.ndarray   # (...,) bool — sample produced

    @staticmethod
    def invalid(batch_shape):
        z = jnp.zeros(batch_shape, jnp.float32)
        return BSDFSample(
            f=jnp.zeros(batch_shape + (N_SPECTRUM_SAMPLES,), jnp.float32),
            wi=jnp.zeros(batch_shape + (3,), jnp.float32)
            .at[..., 2]
            .set(1.0),
            pdf=z,
            flags=jnp.zeros(batch_shape, jnp.int32),
            eta=jnp.ones(batch_shape, jnp.float32),
            pdf_is_proportional=jnp.zeros(batch_shape, bool),
            valid=jnp.zeros(batch_shape, bool),
        )

    def is_specular(self):
        return flags_is_specular(self.flags)


def select_sample(cond, a: BSDFSample, b: BSDFSample) -> BSDFSample:
    """Lane-wise select between two BSDF samples."""
    c1 = cond[..., None]
    return BSDFSample(
        f=jnp.where(c1, a.f, b.f),
        wi=jnp.where(c1, a.wi, b.wi),
        pdf=jnp.where(cond, a.pdf, b.pdf),
        flags=jnp.where(cond, a.flags, b.flags),
        eta=jnp.where(cond, a.eta, b.eta),
        pdf_is_proportional=jnp.where(
            cond, a.pdf_is_proportional, b.pdf_is_proportional
        ),
        valid=jnp.where(cond, a.valid, b.valid),
    )


# --- DiffuseBxDF (bxdf.rs:184-267) ---


def diffuse_f(reflectance, wo, wi):
    """Lambertian: R/π when wo, wi share a hemisphere."""
    same = same_hemisphere(wo, wi)
    return jnp.where(
        same[..., None], reflectance * INV_PI, 0.0
    )


def diffuse_sample_f(reflectance, wo, u, uc=None, sample_flags=SAMPLE_ALL) -> BSDFSample:
    """Cosine-weighted hemisphere sampling."""
    batch = wo.shape[:-1]
    if not (sample_flags & SAMPLE_REFLECTION):
        return BSDFSample.invalid(batch)
    wi = sample_cosine_hemisphere(u)
    # Flip into wo's hemisphere.
    wi = jnp.where((wo[..., 2] < 0.0)[..., None], wi * jnp.array([1.0, 1.0, -1.0]), wi)
    pdf = cosine_hemisphere_pdf(abs_cos_theta(wi))
    return BSDFSample(
        f=reflectance * INV_PI,
        wi=wi,
        pdf=pdf,
        flags=jnp.full(batch, DIFFUSE_REFLECTION, jnp.int32),
        eta=jnp.ones(batch, jnp.float32),
        pdf_is_proportional=jnp.zeros(batch, bool),
        valid=pdf > 0.0,
    )


def diffuse_pdf(wo, wi, sample_flags=SAMPLE_ALL):
    same = same_hemisphere(wo, wi)
    ok = bool(sample_flags & SAMPLE_REFLECTION)
    return jnp.where(same, cosine_hemisphere_pdf(abs_cos_theta(wi)), 0.0) * (
        1.0 if ok else 0.0
    )
