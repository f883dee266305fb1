"""Pixel reconstruction filters.

TPU-native analog of /root/reference/src/filter.rs (which implements only
BoxFilter; SURVEY.md §2.1 lists Gaussian/Mitchell/Triangle/Lanczos as gaps
we close here, following pbrt-v4 semantics).  A filter is a host object with
static parameters; ``evaluate`` / ``sample`` are device functions batched
over lanes.  Non-invertible filters sample via a tabulated 2-D distribution
(FilterSampler) with weight f/(|f| pdf), exactly pbrt's scheme.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.math import sqr
from shimmer_tpu.ops.sampling import (
    build_piecewise_constant_2d,
    sample_tent,
)
from shimmer_tpu.ops.vecmath import vec2


class Filter:
    """Interface mirror of FilterI (src/filter.rs:9-40)."""

    radius: tuple  # (rx, ry)

    def evaluate(self, p):
        """Filter value at offset p=(...,2) from pixel center."""
        raise NotImplementedError

    def integral(self) -> float:
        raise NotImplementedError

    def sample(self, u):
        """u: (...,2) → (p (...,2), weight (...,))."""
        raise NotImplementedError

    @staticmethod
    def create(name: str, **params) -> "Filter":
        name = name.lower()
        if name == "box":
            return BoxFilter(
                params.get("xradius", 0.5), params.get("yradius", 0.5)
            )
        if name == "triangle":
            return TriangleFilter(
                params.get("xradius", 2.0), params.get("yradius", 2.0)
            )
        if name == "gaussian":
            return GaussianFilter(
                params.get("xradius", 1.5),
                params.get("yradius", 1.5),
                params.get("sigma", 0.5),
            )
        if name == "mitchell":
            return MitchellFilter(
                params.get("xradius", 2.0),
                params.get("yradius", 2.0),
                params.get("B", 1.0 / 3.0),
                params.get("C", 1.0 / 3.0),
            )
        if name in ("sinc", "lanczossinc"):
            return LanczosSincFilter(
                params.get("xradius", 4.0),
                params.get("yradius", 4.0),
                params.get("tau", 3.0),
            )
        raise ValueError(f"unknown filter: {name}")


class BoxFilter(Filter):
    """Default box filter, radius 0.5 (src/filter.rs:27-113)."""

    def __init__(self, xr=0.5, yr=0.5):
        self.radius = (float(xr), float(yr))

    def evaluate(self, p):
        rx, ry = self.radius
        inside = (jnp.abs(p[..., 0]) <= rx) & (jnp.abs(p[..., 1]) <= ry)
        return jnp.where(inside, 1.0, 0.0)

    def integral(self):
        return 2.0 * self.radius[0] * 2.0 * self.radius[1]

    def sample(self, u):
        rx, ry = self.radius
        p = vec2(
            (2.0 * u[..., 0] - 1.0) * rx, (2.0 * u[..., 1] - 1.0) * ry
        )
        return p, jnp.ones(u.shape[:-1], jnp.float32)


class TriangleFilter(Filter):
    def __init__(self, xr=2.0, yr=2.0):
        self.radius = (float(xr), float(yr))

    def evaluate(self, p):
        rx, ry = self.radius
        return jnp.maximum(0.0, rx - jnp.abs(p[..., 0])) * jnp.maximum(
            0.0, ry - jnp.abs(p[..., 1])
        )

    def integral(self):
        return sqr(self.radius[0]) * sqr(self.radius[1])

    def sample(self, u):
        p = vec2(
            sample_tent(u[..., 0], self.radius[0]),
            sample_tent(u[..., 1], self.radius[1]),
        )
        return p, jnp.ones(u.shape[:-1], jnp.float32)


class _SampledFilter(Filter):
    """Tabulated |f| sampling for filters without analytic inversion
    (pbrt FilterSampler)."""

    _TABLE = 64

    def _build_sampler(self):
        n = self._TABLE
        rx, ry = self.radius
        xs = (np.arange(n) + 0.5) / n * 2.0 * rx - rx
        ys = (np.arange(n) + 0.5) / n * 2.0 * ry - ry
        px, py = np.meshgrid(xs, ys)
        pts = jnp.asarray(np.stack([px, py], axis=-1), jnp.float32)
        f = np.asarray(self.evaluate(pts))
        self._f_table = jnp.asarray(f, jnp.float32)
        self._dist = build_piecewise_constant_2d(
            np.abs(f), domain=((-rx, -ry), (rx, ry))
        )

    def sample(self, u):
        p, pdf = self._dist.sample(u)
        f = self.evaluate(p)
        w = jnp.where(pdf > 0.0, f / jnp.where(pdf > 0.0, pdf, 1.0), 0.0)
        return p, w


class GaussianFilter(_SampledFilter):
    def __init__(self, xr=1.5, yr=1.5, sigma=0.5):
        self.radius = (float(xr), float(yr))
        self.sigma = float(sigma)
        self._exp_x = float(np.exp(-sqr(xr) / (2.0 * sigma * sigma)))
        self._exp_y = float(np.exp(-sqr(yr) / (2.0 * sigma * sigma)))
        self._build_sampler()

    def _g(self, x, exp_r):
        g = jnp.exp(-sqr(x) / (2.0 * self.sigma**2))
        return jnp.maximum(0.0, g - exp_r)

    def evaluate(self, p):
        return self._g(p[..., 0], self._exp_x) * self._g(p[..., 1], self._exp_y)

    def integral(self):
        # ∫ max(0, g(x) - g(r)) over [-r, r], separable
        from scipy.special import erf

        s = self.sigma
        rx, ry = self.radius

        def one(r, e):
            return s * np.sqrt(2 * np.pi) * erf(r / (s * np.sqrt(2))) - 2 * r * e

        return float(one(rx, self._exp_x) * one(ry, self._exp_y))


class MitchellFilter(_SampledFilter):
    def __init__(self, xr=2.0, yr=2.0, b=1.0 / 3.0, c=1.0 / 3.0):
        self.radius = (float(xr), float(yr))
        self.b, self.c = float(b), float(c)
        self._build_sampler()

    def _mitchell_1d(self, x):
        b, c = self.b, self.c
        x = jnp.abs(2.0 * x)
        x2, x3 = x * x, x * x * x
        inner = (
            (12 - 9 * b - 6 * c) * x3
            + (-18 + 12 * b + 6 * c) * x2
            + (6 - 2 * b)
        ) * (1.0 / 6.0)
        outer = (
            (-b - 6 * c) * x3
            + (6 * b + 30 * c) * x2
            + (-12 * b - 48 * c) * x
            + (8 * b + 24 * c)
        ) * (1.0 / 6.0)
        return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))

    def evaluate(self, p):
        rx, ry = self.radius
        return self._mitchell_1d(p[..., 0] / rx) * self._mitchell_1d(
            p[..., 1] / ry
        )

    def integral(self):
        return self.radius[0] * self.radius[1] / 4.0


class LanczosSincFilter(_SampledFilter):
    def __init__(self, xr=4.0, yr=4.0, tau=3.0):
        self.radius = (float(xr), float(yr))
        self.tau = float(tau)
        self._build_sampler()

    def evaluate(self, p):
        from shimmer_tpu.ops.math import windowed_sinc

        return windowed_sinc(p[..., 0], self.radius[0], self.tau) * windowed_sinc(
            p[..., 1], self.radius[1], self.tau
        )

    def integral(self):
        # numeric quadrature (cached at construction would also work)
        n = 513
        rx, ry = self.radius
        xs = np.linspace(-rx, rx, n)
        ys = np.linspace(-ry, ry, n)
        px, py = np.meshgrid(xs, ys)
        f = np.asarray(self.evaluate(jnp.asarray(np.stack([px, py], -1), jnp.float32)))
        return float(np.trapezoid(np.trapezoid(f, ys, axis=0), xs))


def get_camera_sample(filter_: Filter, pixel_xy, u_filter, u_lens, u_time=None):
    """Map a pixel coordinate + uniform draws to a film sample.

    Analog of src/sampling.rs:347-372 get_camera_sample — filter importance
    sampling with the half-pixel offset convention (pbrt 8.1.4).

    pixel_xy: (..., 2) integer pixel coords; returns (p_film (...,2),
    filter_weight (...,), p_lens (...,2)).
    """
    offset, weight = filter_.sample(u_filter)
    p_film = pixel_xy.astype(jnp.float32) + 0.5 + offset
    return p_film, weight, u_lens
