"""Hero-wavelength sampled spectra.

TPU-native analog of /root/reference/src/spectra/sampled_spectrum.rs and
sampled_wavelengths.rs.  A SampledSpectrum is a plain ``(..., 4)`` jnp array
(4 hero wavelengths — NUM_SPECTRUM_SAMPLES, src/spectra/mod.rs:17); the
wavelengths themselves travel in a :class:`SampledWavelengths` pytree with a
per-wavelength pdf.  All ops broadcast over lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.math import lerp, safe_div
from shimmer_tpu.ops.sampling import (
    sample_visible_wavelengths,
    visible_wavelengths_pdf,
)
from shimmer_tpu.utils.pytree import pytree_dataclass

N_SPECTRUM_SAMPLES = 4
LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0


@pytree_dataclass
class SampledWavelengths:
    """Hero wavelengths + sampling pdf, batched (..., 4)."""

    lam: jnp.ndarray
    pdf: jnp.ndarray

    @staticmethod
    def sample_uniform(u, lambda_min=LAMBDA_MIN, lambda_max=LAMBDA_MAX):
        """u: (...,) → wavelengths stratified-wrapped over [min, max]
        (src/spectra/sampled_wavelengths.rs sample_uniform)."""
        u = jnp.asarray(u, jnp.float32)
        first = lerp(u, lambda_min, lambda_max)
        delta = (lambda_max - lambda_min) / N_SPECTRUM_SAMPLES
        i = jnp.arange(N_SPECTRUM_SAMPLES, dtype=jnp.float32)
        lam = first[..., None] + i * delta
        lam = jnp.where(
            lam > lambda_max, lambda_min + (lam - lambda_max), lam
        )
        pdf = jnp.full_like(lam, 1.0 / (lambda_max - lambda_min))
        return SampledWavelengths(lam=lam, pdf=pdf)

    @staticmethod
    def sample_visible(u):
        """Importance-sample ∝ the visible-luminosity weighting
        (src/spectra/sampled_wavelengths.rs sample_visible)."""
        u = jnp.asarray(u, jnp.float32)
        i = jnp.arange(N_SPECTRUM_SAMPLES, dtype=jnp.float32)
        up = u[..., None] + i / N_SPECTRUM_SAMPLES
        up = jnp.where(up > 1.0, up - 1.0, up)
        lam = sample_visible_wavelengths(up)
        pdf = visible_wavelengths_pdf(lam)
        return SampledWavelengths(lam=lam, pdf=pdf)

    def terminate_secondary(self):
        """Collapse to the single hero wavelength (dispersion — reference
        src/spectra/sampled_wavelengths.rs terminate_secondary).

        Idempotent: already-terminated lanes are unchanged.
        """
        already = self.secondary_terminated()
        mask = jnp.arange(N_SPECTRUM_SAMPLES) == 0
        new_pdf = jnp.where(
            already[..., None],
            self.pdf,
            jnp.where(mask, self.pdf[..., :1] / N_SPECTRUM_SAMPLES, 0.0),
        )
        return SampledWavelengths(lam=self.lam, pdf=new_pdf)

    def terminate_secondary_where(self, cond):
        """Masked terminate_secondary for wavefront lanes; cond: (...,)."""
        term = self.terminate_secondary()
        pdf = jnp.where(cond[..., None], term.pdf, self.pdf)
        return SampledWavelengths(lam=self.lam, pdf=pdf)

    def secondary_terminated(self):
        return jnp.all(self.pdf[..., 1:] == 0.0, axis=-1)

    def pdf_as_spectrum(self):
        return self.pdf


# --- SampledSpectrum helpers (src/spectra/sampled_spectrum.rs) ---


def ss_const(value, batch_shape=()):
    return jnp.full(tuple(batch_shape) + (N_SPECTRUM_SAMPLES,), value, jnp.float32)


def ss_average(s):
    return jnp.mean(s, axis=-1)


def ss_safe_div(a, b):
    return safe_div(a, b)


def ss_is_black(s):
    return jnp.all(s == 0.0, axis=-1)


def ss_max_component(s):
    return jnp.max(s, axis=-1)
