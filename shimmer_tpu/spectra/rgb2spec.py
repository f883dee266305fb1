"""RGB → reflectance-spectrum uplifting (sigmoid polynomials).

TPU-native analog of /root/reference/src/rgb_to_spectra.rs + the
RgbSigmoidPolynomial in src/color.rs:333-401.  The reference ships
precomputed 64^3 coefficient tables (rgb2spec; absent from the snapshot);
we instead *fit* coefficients on demand with a damped Gauss-Newton solve
(Jakob & Hanika 2019 round-trip objective), vectorized over batches of
colors — scenes resolve a handful of distinct albedos at build time, and
textures fit their unique texel colors once at load.

Convention: the polynomial runs in a normalized wavelength basis
x = (λ - 360) / 470 ∈ [0, 1] (better f32 conditioning than nm-space), so
coefficients are NOT interchangeable with pbrt's tables; evaluation and fit
agree internally, which is all that matters.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.spectra.sampled import LAMBDA_MAX, LAMBDA_MIN
from shimmer_tpu.spectra.spectrum import (
    CIE_Y_INTEGRAL,
    Spectrum,
    cie_xyz_dense,
)


def _sigmoid_np(t):
    out = 0.5 + t / (2.0 * np.sqrt(1.0 + t * t))
    return np.where(np.isposinf(t), 1.0, np.where(np.isneginf(t), 0.0, out))


def sigmoid(t):
    """s(t) = 1/2 + t / (2 sqrt(1 + t^2)) (src/color.rs:372-381)."""
    return 0.5 + t / (2.0 * jnp.sqrt(1.0 + t * t))


def _norm_lambda(lam):
    return (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)


def sigmoid_poly_sample(coeffs, lam):
    """Device eval of sigmoid-polynomial spectra.

    coeffs: (..., 3) [c0, c1, c2]; lam: (..., 4) in nm → (..., 4).
    """
    x = _norm_lambda(jnp.asarray(lam, jnp.float32))
    c0 = coeffs[..., 0:1]
    c1 = coeffs[..., 1:2]
    c2 = coeffs[..., 2:3]
    return sigmoid((c0 * x + c1) * x + c2)


def sigmoid_poly_max_value(coeffs) -> float:
    """Max over the visible range (host; src/color.rs max_value)."""
    c0, c1, c2 = (float(c) for c in coeffs)
    vals = [_sigmoid_np(c2), _sigmoid_np(c0 + c1 + c2)]
    if c0 != 0.0:
        xv = -c1 / (2.0 * c0)
        if 0.0 <= xv <= 1.0:
            vals.append(float(_sigmoid_np((c0 * xv + c1) * xv + c2)))
    return max(vals)


@functools.cache
def _basis() -> np.ndarray:
    """(471, 3) polynomial basis [x^2, x, 1] at the dense wavelengths."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0)
    x = _norm_lambda(lam)
    return np.stack([x * x, x, np.ones_like(x)], axis=-1)


def _projection_matrix(cs) -> np.ndarray:
    """(3, 471) matrix: reflectance table → linear RGB in colorspace ``cs``
    under its illuminant (the Jakob-Hanika round-trip projection)."""
    cie = cie_xyz_dense().astype(np.float64)  # (3, 471)
    illum = cs.illuminant.to_dense().astype(np.float64)  # (471,)
    w = float(np.sum(cie[1] * illum))
    a_xyz = cie * illum[None, :] / w
    return cs.rgb_from_xyz @ a_xyz


_PROJ_CACHE: dict[str, np.ndarray] = {}


def _get_projection(cs) -> np.ndarray:
    key = cs.name or id(cs)
    if key not in _PROJ_CACHE:
        _PROJ_CACHE[key] = _projection_matrix(cs)
    return _PROJ_CACHE[key]


def fit_rgb_coeffs(rgb, cs, iters: int = 40) -> np.ndarray:
    """Fit sigmoid-polynomial coefficients for a batch of albedo colors.

    rgb: (N, 3) in [0, 1]; returns (N, 3) float32 coefficients such that
    projecting sigmoid(poly(x)) through the colorspace round-trip reproduces
    rgb.  Damped Gauss-Newton, float64 on host.
    """
    rgb = np.atleast_2d(np.asarray(rgb, np.float64))
    n = rgb.shape[0]
    a = _get_projection(cs)  # (3, 471)
    b = _basis()  # (471, 3)

    # Init: constant spectrum at the luminance-ish mean via inverse sigmoid.
    mean = np.clip(rgb.mean(axis=-1), 1e-4, 1.0 - 1e-4)
    t0 = (2.0 * mean - 1.0) / (2.0 * np.sqrt(mean * (1.0 - mean)))
    c = np.zeros((n, 3))
    c[:, 2] = t0

    lm = np.full(n, 1e-4)
    prev_err = np.full(n, np.inf)
    for _ in range(iters):
        p = c @ b.T  # (N, 471) polynomial values
        s = _sigmoid_np(p)
        resid = s @ a.T - rgb  # (N, 3)
        err = np.sum(resid * resid, axis=-1)
        # Adapt damping: success → decrease, failure handled via the solve.
        lm = np.where(err < prev_err, lm * 0.5, lm * 4.0)
        lm = np.clip(lm, 1e-10, 1e4)
        prev_err = np.minimum(prev_err, err)
        ds = 0.5 / np.power(1.0 + p * p, 1.5)  # s'(p), (N, 471)
        # J[n] = A @ diag(ds[n]) @ B : (3, 3)
        jac = np.einsum("kl,nl,lc->nkc", a, ds, b)
        jtj = np.einsum("nkc,nkd->ncd", jac, jac)
        jtr = np.einsum("nkc,nk->nc", jac, resid)
        jtj += lm[:, None, None] * np.eye(3)[None]
        dc = np.linalg.solve(jtj, jtr[..., None])[..., 0]
        c = c - dc
    return c.astype(np.float32)


# --- host spectrum classes mirroring the reference's RGB spectra ---


class RgbAlbedoSpectrum(Spectrum):
    """Reflectance spectrum for rgb in [0,1]^3
    (src/spectra/spectrum.rs RgbAlbedoSpectrum)."""

    def __init__(self, cs, rgb):
        rgb = np.clip(np.asarray(rgb, np.float64), 0.0, 1.0)
        self.coeffs = fit_rgb_coeffs(rgb[None], cs)[0]

    def get(self, lam):
        x = _norm_lambda(np.asarray(lam, np.float64))
        c0, c1, c2 = self.coeffs
        return _sigmoid_np((c0 * x + c1) * x + c2)

    def max_value(self):
        return sigmoid_poly_max_value(self.coeffs)

    def sample(self, swl):
        return sigmoid_poly_sample(jnp.asarray(self.coeffs), swl.lam)


class RgbUnboundedSpectrum(Spectrum):
    """Scaled reflectance for rgb outside [0,1]
    (src/spectra/spectrum.rs RgbUnboundedSpectrum)."""

    def __init__(self, cs, rgb):
        rgb = np.asarray(rgb, np.float64)
        m = float(np.max(rgb))
        self.scale = 2.0 * m
        base = rgb / self.scale if self.scale != 0.0 else np.zeros(3)
        self.coeffs = fit_rgb_coeffs(base[None], cs)[0]

    def get(self, lam):
        x = _norm_lambda(np.asarray(lam, np.float64))
        c0, c1, c2 = self.coeffs
        return self.scale * _sigmoid_np((c0 * x + c1) * x + c2)

    def max_value(self):
        return self.scale * sigmoid_poly_max_value(self.coeffs)

    def sample(self, swl):
        return jnp.float32(self.scale) * sigmoid_poly_sample(
            jnp.asarray(self.coeffs), swl.lam
        )


class RgbIlluminantSpectrum(Spectrum):
    """Emission spectrum: scaled sigmoid modulated by the space's illuminant
    (src/spectra/spectrum.rs RgbIlluminantSpectrum)."""

    def __init__(self, cs, rgb):
        rgb = np.asarray(rgb, np.float64)
        m = float(np.max(rgb))
        self.scale = 2.0 * m
        base = rgb / self.scale if self.scale != 0.0 else np.zeros(3)
        self.coeffs = fit_rgb_coeffs(base[None], cs)[0]
        self.illuminant = cs.illuminant
        self._illum_dense = cs.illuminant.to_dense()

    def photometric_base(self):
        # spectrum_to_photometric normalizes against the base illuminant
        # (src/spectra/spectrum.rs:617-631).
        return self.illuminant

    def get(self, lam):
        x = _norm_lambda(np.asarray(lam, np.float64))
        c0, c1, c2 = self.coeffs
        return (
            self.scale
            * _sigmoid_np((c0 * x + c1) * x + c2)
            * self.illuminant.get(lam)
        )

    def max_value(self):
        return (
            self.scale
            * sigmoid_poly_max_value(self.coeffs)
            * self.illuminant.max_value()
        )

    def sample(self, swl):
        from shimmer_tpu.spectra.spectrum import dense_sample

        return (
            jnp.float32(self.scale)
            * sigmoid_poly_sample(jnp.asarray(self.coeffs), swl.lam)
            * dense_sample(jnp.asarray(self._illum_dense), swl.lam)
        )
