"""Film accumulation precision at Ganesha-scale spp (VERDICT r2 #9).

The reference accumulates film sums in f64 (film.rs:470-479); this film
uses f32 accumulators (film/film.py:10-13).  These tests bound the f32
accumulation error against an exact f64 oracle over 1024 waves of
samples — the BASELINE config #4 sample count — and over a pathological
high-dynamic-range stream.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.film.filters import BoxFilter
from shimmer_tpu.film.film import PixelSensor, RgbFilm
from shimmer_tpu.spectra.sampled import SampledWavelengths


def _film(res=8):
    cs = get_named_color_space("srgb")
    return RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)


def test_1024_wave_accumulation_matches_f64():
    film = _film()
    w, h = film.resolution
    n = w * h
    rng = np.random.default_rng(0)
    state = film.init_state()

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pixel_xy = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], axis=-1), jnp.int32
    )

    rgb64 = np.zeros((h, w, 3), np.float64)
    w64 = np.zeros((h, w), np.float64)
    for wave in range(0, 1024, 64):
        # One fused 64-spp wave per loop iteration keeps the test quick
        # while performing the full 1024 scatter-adds per pixel.
        for _ in range(64):
            L = jnp.asarray(
                rng.lognormal(0.0, 1.5, (n, 4)).astype(np.float32)
            )
            u = jnp.asarray(rng.uniform(size=(n,)).astype(np.float32))
            swl = SampledWavelengths.sample_visible(u)
            weight = jnp.asarray(
                rng.uniform(0.2, 1.8, (n,)).astype(np.float32)
            )
            state = film.add_samples(state, pixel_xy, L, swl, weight)
            contrib = np.asarray(
                film._clamped_rgb(L, swl) * weight[..., None], np.float64
            )
            rgb64[ys.ravel(), xs.ravel()] += contrib
            w64[ys.ravel(), xs.ravel()] += np.asarray(weight, np.float64)
        if wave == 0:
            # Spot-check early: scatters must land on the right pixels.
            assert float(jnp.min(state.weight_sum)) > 0.0

    img32 = np.asarray(state.rgb_sum, np.float64) / np.asarray(
        state.weight_sum, np.float64
    )[..., None]
    img64 = rgb64 / w64[..., None]
    rel = np.abs(img32 - img64) / np.maximum(np.abs(img64), 1e-3)
    assert rel.max() < 1e-4, f"f32 film accumulation error {rel.max():.2e}"


def test_hdr_stream_accumulation():
    """Mixed tiny/huge sample stream (firefly-adjacent): f32 sums must
    stay within 1e-3 relative of f64 even when increments span 6
    decades."""
    film = _film(res=2)
    state = film.init_state()
    rng = np.random.default_rng(1)
    pixel_xy = jnp.asarray([[0, 0]], jnp.int32)
    total = np.zeros(3, np.float64)
    wtot = 0.0
    for i in range(512):
        mag = 10.0 ** rng.uniform(-3, 3)
        L = jnp.asarray(rng.uniform(0.5, 1.5, (1, 4)) * mag, jnp.float32)
        swl = SampledWavelengths.sample_visible(
            jnp.asarray([rng.uniform()], jnp.float32)
        )
        state = film.add_samples(
            state, pixel_xy, L, swl, jnp.ones(1, jnp.float32)
        )
        total += np.asarray(film._clamped_rgb(L, swl), np.float64)[0]
        wtot += 1.0
    got = np.asarray(state.rgb_sum, np.float64)[0, 0]
    rel = np.abs(got - total) / np.maximum(np.abs(total), 1e-12)
    assert rel.max() < 1e-3, f"HDR f32 accumulation error {rel.max():.2e}"
