"""Spectral distributions: host-side construction + device-side evaluation.

TPU-native analog of /root/reference/src/spectra/spectrum.rs, cie.rs and
named_spectrum.rs.  Host classes (numpy) build scene spectra; each bakes to a
471-entry densely-sampled table (1 nm bins over [360, 830]) that device code
evaluates with a gather, or to analytic parameters (sigmoid-RGB, blackbody)
evaluated closed-form on the VPU.  The standard data tables (CIE 1931
matching functions, CIE S0/S1/S2, D illuminants, measured metal/glass IORs,
BabelColor swatches) live in ``data/spectra_data.npz``.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.spectra.sampled import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    N_SPECTRUM_SAMPLES,
)

CIE_Y_INTEGRAL = 106.856895  # reference: src/spectra/cie.rs:11
N_DENSE = 471  # 1 nm bins, 360..830 inclusive

_DATA_PATH = Path(__file__).parent / "data" / "spectra_data.npz"


@functools.cache
def _data():
    return np.load(_DATA_PATH)


@functools.cache
def cie_xyz_dense():
    """(3, 471) CIE 1931 matching functions at 1 nm from 360 nm."""
    d = _data()
    return np.stack(
        [d["cie_x"], d["cie_y"], d["cie_z"]], axis=0
    ).astype(np.float32)


def dense_sample(values, lam):
    """Evaluate a densely-sampled spectrum table on device.

    values: (..., 471) or (471,); lam: (..., 4) wavelengths in nm.
    Nearest-bin (truncating) lookup matching the reference
    (src/spectra/spectrum.rs DenselySampledSpectrum::get uses ``lambda as
    i32`` truncation); out-of-range → 0.
    """
    values = jnp.asarray(values, jnp.float32)
    idx = jnp.asarray(lam, jnp.float32).astype(jnp.int32) - int(LAMBDA_MIN)
    in_range = (idx >= 0) & (idx < N_DENSE)
    idx = jnp.clip(idx, 0, N_DENSE - 1)
    if values.ndim == 1:
        v = values[idx]
    else:
        v = jnp.take_along_axis(values, idx, axis=-1)
    return jnp.where(in_range, v, 0.0)


def dense_sample_rows(table, row_idx, lam):
    """``dense_sample(table[row_idx], lam)`` fused into one 2-D gather.

    table: (K, 471); row_idx: (...,) int; lam: (..., 4).  Gathering the
    full 471-bin row per lane materializes ~2 KB/lane before the 4-bin
    take; indexing (row, bin) jointly fetches just the 4 floats."""
    table = jnp.asarray(table, jnp.float32)
    idx = jnp.asarray(lam, jnp.float32).astype(jnp.int32) - int(LAMBDA_MIN)
    in_range = (idx >= 0) & (idx < N_DENSE)
    idx = jnp.clip(idx, 0, N_DENSE - 1)
    v = table[row_idx[..., None], idx]
    return jnp.where(in_range, v, 0.0)


def cie_xyz_sample(lam):
    """Sample the CIE X/Y/Z matching functions at (..., 4) wavelengths.

    Returns (x, y, z) each (..., 4)."""
    t = jnp.asarray(cie_xyz_dense())
    return dense_sample(t[0], lam), dense_sample(t[1], lam), dense_sample(t[2], lam)


# --- host-side spectrum classes ---


class Spectrum:
    """Base host spectrum; ``get`` accepts numpy scalars or arrays."""

    def get(self, lam):
        raise NotImplementedError

    def max_value(self) -> float:
        raise NotImplementedError

    def to_dense(self) -> np.ndarray:
        """Bake to a (471,) table at 1 nm bins."""
        lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0)
        return np.asarray(self.get(lam), np.float32)

    def sample(self, swl):
        """Device eval at SampledWavelengths → (..., 4) SampledSpectrum."""
        return dense_sample(jnp.asarray(self.to_dense()), swl.lam)


class ConstantSpectrum(Spectrum):
    def __init__(self, c: float):
        self.c = float(c)

    def get(self, lam):
        return np.full_like(np.asarray(lam, np.float64), self.c)

    def max_value(self):
        return self.c

    def sample(self, swl):
        return jnp.full(swl.lam.shape, self.c, jnp.float32)


class DenselySampledSpectrum(Spectrum):
    def __init__(self, values, lambda_min=int(LAMBDA_MIN)):
        self.values = np.asarray(values, np.float64)
        self.lambda_min = int(lambda_min)

    @staticmethod
    def from_spectrum(s: Spectrum):
        return DenselySampledSpectrum(s.to_dense())

    def get(self, lam):
        idx = np.asarray(lam, np.int64) - self.lambda_min
        ok = (idx >= 0) & (idx < len(self.values))
        return np.where(ok, self.values[np.clip(idx, 0, len(self.values) - 1)], 0.0)

    def max_value(self):
        return float(np.max(self.values))


class PiecewiseLinearSpectrum(Spectrum):
    """Sorted (lambda, value) knots, linearly interpolated, 0 outside
    (src/spectra/spectrum.rs PiecewiseLinearSpectrum)."""

    def __init__(self, lambdas, values):
        self.lambdas = np.asarray(lambdas, np.float64)
        self.values = np.asarray(values, np.float64)
        assert np.all(np.diff(self.lambdas) > 0)

    @staticmethod
    def from_interleaved(samples, normalize: bool):
        """Interleaved [λ0, v0, λ1, v1, ...]; extends to cover the visible
        range; optionally normalizes to luminance CIE_Y_INTEGRAL
        (src/spectra/spectrum.rs:324-371)."""
        samples = np.asarray(samples, np.float64)
        lam = samples[0::2]
        val = samples[1::2]
        if lam[0] > LAMBDA_MIN:
            lam = np.concatenate([[LAMBDA_MIN - 1.0], lam])
            val = np.concatenate([[val[0]], val])
        if lam[-1] < LAMBDA_MAX:
            lam = np.concatenate([lam, [LAMBDA_MAX + 1.0]])
            val = np.concatenate([val, [val[-1]]])
        s = PiecewiseLinearSpectrum(lam, val)
        if normalize:
            s = s.scaled(CIE_Y_INTEGRAL / inner_product(s, cie_y_spectrum()))
        return s

    def scaled(self, k: float):
        return PiecewiseLinearSpectrum(self.lambdas, self.values * k)

    def get(self, lam):
        lam = np.asarray(lam, np.float64)
        v = np.interp(lam, self.lambdas, self.values)
        inside = (lam >= self.lambdas[0]) & (lam <= self.lambdas[-1])
        return np.where(inside, v, 0.0)

    def max_value(self):
        return float(np.max(self.values))


class BlackbodySpectrum(Spectrum):
    """Planck spectrum normalized to peak 1 (src/spectra/spectrum.rs:443-496)."""

    def __init__(self, t: float):
        self.t = float(t)
        lambda_max_m = 2.8977721e-3 / self.t  # Wien
        self.normalization = 1.0 / _planck(lambda_max_m * 1e9, self.t)

    def get(self, lam):
        return _planck(np.asarray(lam, np.float64), self.t) * self.normalization

    def max_value(self):
        return 1.0

    def sample(self, swl):
        return planck_device(swl.lam, self.t) * jnp.float32(self.normalization)


def _planck(lam_nm, t):
    """Blackbody emitted radiance at λ (nm), temperature T (K)."""
    if t < 0.0:
        return np.zeros_like(np.asarray(lam_nm, np.float64))
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l = np.asarray(lam_nm, np.float64) * 1e-9
    return (2.0 * h * c * c) / (l**5 * (np.exp((h * c) / (l * kb * t)) - 1.0))


def planck_device(lam_nm, t):
    """Device (jnp) Planck evaluation."""
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l = jnp.asarray(lam_nm, jnp.float32) * 1e-9
    # Compute in a numerically safe way for f32: the 1e-34 constants
    # underflow f32, so fold exponents analytically.
    # 2hc^2 = 1.1910429e-16 W m^2; hc/kb = 1.4387770e-2 m K.
    num = jnp.float32(1.1910429e-16)
    l5 = l * l * l * l * l
    return num / (l5 * jnp.expm1(jnp.float32(1.4387770e-2) / (l * t)))


# --- CIE spectra / named spectra ---


@functools.cache
def cie_x_spectrum() -> DenselySampledSpectrum:
    return DenselySampledSpectrum(_data()["cie_x"])


@functools.cache
def cie_y_spectrum() -> DenselySampledSpectrum:
    return DenselySampledSpectrum(_data()["cie_y"])


@functools.cache
def cie_z_spectrum() -> DenselySampledSpectrum:
    return DenselySampledSpectrum(_data()["cie_z"])


_NAMED_SPECS = {
    # name -> (npz key, normalize) — reference src/spectra/named_spectrum.rs
    "stdillum-D65": ("cie_illum_d6500", True),
    "stdillum-D50": ("cie_illum_d5000", True),
    "illum-acesD60": ("aces_illum_d60", True),
    "glass-BK7": ("glass_bk7_eta_samples", False),
    "glass-baf10": ("glass_baf10_eta_samples", False),
    "glass-F11": ("glass_f11_eta_samples", False),
    "metal-Cu-eta": ("cu_eta_samples", False),
    "metal-Cu-k": ("cu_k_samples", False),
    "metal-Au-eta": ("au_eta_samples", False),
    "metal-Au-k": ("au_k_samples", False),
    "metal-Ag-eta": ("ag_eta_samples", False),
    "metal-Ag-k": ("ag_k_samples", False),
    "metal-Al-eta": ("al_eta_samples", False),
    "metal-Al-k": ("al_k_samples", False),
}


@functools.cache
def named_spectrum(name: str) -> PiecewiseLinearSpectrum | None:
    """Look up a named spectrum (src/spectra/named_spectrum.rs from_str)."""
    entry = _NAMED_SPECS.get(name)
    if entry is None:
        return None
    key, normalize = entry
    return PiecewiseLinearSpectrum.from_interleaved(_data()[key], normalize)


def swatch_reflectances() -> list[PiecewiseLinearSpectrum]:
    """24 BabelColor ColorChecker swatch reflectances (src/film.rs:1032-1379)."""
    return [
        PiecewiseLinearSpectrum.from_interleaved(row, False)
        for row in _data()["swatch_reflectances"]
    ]


def d_illuminant(temperature: float) -> DenselySampledSpectrum:
    """CIE D illuminant for a correlated color temperature
    (src/spectra/spectrum.rs:215-260)."""
    cct = temperature * 1.4388 / 1.4380
    if cct < 4000.0:
        return DenselySampledSpectrum.from_spectrum(BlackbodySpectrum(cct))
    if cct <= 7000.0:
        x = -4.607e9 / cct**3 + 2.9678e6 / cct**2 + 0.09911e3 / cct + 0.244063
    else:
        x = -2.0064e9 / cct**3 + 1.9018e6 / cct**2 + 0.24748e3 / cct + 0.23704
    # NOTE: the reference transcribes the 1e6 term as ``2.9678e6 / cct * cct``
    # (a no-op); the correct CIE formula divides by cct^2, which we use.
    y = -3.0 * x * x + 2.870 * x - 0.275
    m = 0.0241 + 0.2562 * x - 0.7341 * y
    m1 = (-1.3515 - 1.7703 * x + 5.9114 * y) / m
    m2 = (0.0300 - 31.4424 * x + 30.0717 * y) / m
    d = _data()
    values = (d["cie_s0"] + d["cie_s1"] * m1 + d["cie_s2"] * m2) * 0.01
    pls = PiecewiseLinearSpectrum(d["cie_s_lambda"], values)
    return DenselySampledSpectrum.from_spectrum(pls)


# --- integrals (host) ---


def inner_product(a: Spectrum, b: Spectrum) -> float:
    """Σ over 1 nm bins of a(λ)·b(λ) (src/spectra/spectrum.rs:609-615)."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0)
    return float(np.sum(a.get(lam) * b.get(lam)))


def spectrum_to_photometric(s: Spectrum) -> float:
    """Luminous normalization Σ Y(λ) s(λ) (src/spectra/spectrum.rs:617-631).

    For RgbIlluminantSpectrum the reference measures the base illuminant, not
    the modulated spectrum; callers handle that case.
    """
    base = getattr(s, "photometric_base", None)
    target = base() if base is not None else s
    return inner_product(cie_y_spectrum(), target)


def spectrum_xyz(s: Spectrum) -> np.ndarray:
    """XYZ coordinates of a (reflectance-free) spectrum."""
    return np.array(
        [
            inner_product(cie_x_spectrum(), s),
            inner_product(cie_y_spectrum(), s),
            inner_product(cie_z_spectrum(), s),
        ]
    ) / CIE_Y_INTEGRAL
