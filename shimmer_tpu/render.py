"""Render orchestration: the wave loop.

TPU-native analog of /root/reference/src/render.rs +
ImageTileIntegrator::render (src/integrator.rs:119-397).  The reference
tiles the image 8×8 over rayon threads and renders spp in growing waves
(1, 2, 4, …, 64); here one *wave* is a single jitted program evaluating a
fixed number of samples for every pixel at once — the chip's vector lanes
replace threads, the wave loop replaces the spp loop, and the film update is
a scatter-add instead of locked pixel writes.  Multi-chip sharding wraps
``render_wave`` in shard_map (shimmer_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shimmer_tpu.film.filters import get_camera_sample
from shimmer_tpu.film.film import FilmState, RgbFilm
from shimmer_tpu.integrators.path import li_path, li_random_walk, li_simple_path
from shimmer_tpu.scene import Scene

INTEGRATORS = {
    "path": li_path,
    "simplepath": li_simple_path,
    "randomwalk": li_random_walk,
}


def make_wave_renderer(
    scene: Scene,
    camera,
    film: RgbFilm,
    sampler,
    integrator: str = "path",
    max_depth: int = 5,
    regularize: bool = False,
    use_visible_wavelengths: bool = True,
    integrator_options: dict | None = None,
):
    """Build the jitted per-wave render function.

    Returns wave_fn(film_state, sample_index_base, wave_spp) — but since
    wave_spp must be static we close over it per call via partial jit.
    """
    li_fn = INTEGRATORS[integrator]
    w, h = film.resolution
    opts = dict(integrator_options or {})
    if integrator == "path" and regularize:
        opts["regularize"] = True

    def render_samples(film_state: FilmState, sample_indices: jnp.ndarray):
        """Render one sample index per pixel for each index in
        sample_indices (static length), scatter into film."""
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # (N,2)

        def one_sample(fs, sample_index):
            s_state = sampler.start_pixel_sample(pixel_xy, sample_index)
            # Draw order mirrors evaluate_pixel_sample
            # (integrator.rs:326-396): wavelengths, filter, lens.
            u_lam, s_state = sampler.get_1d(s_state)
            if use_visible_wavelengths:
                swl = film.sample_wavelengths(u_lam)
            else:
                from shimmer_tpu.spectra.sampled import SampledWavelengths

                swl = SampledWavelengths.sample_uniform(u_lam)
            u_filter, s_state = sampler.get_pixel_2d(s_state)
            u_lens, s_state = sampler.get_2d(s_state)
            p_film, weight, u_lens = get_camera_sample(
                film.filter, pixel_xy, u_filter, u_lens
            )
            ray = camera.generate_ray(p_film, u_lens)
            l = li_fn(scene, ray, swl, sampler, s_state, max_depth, **opts)
            # NaN/∞ guard (integrator.rs:377-382).
            bad = jnp.any(~jnp.isfinite(l), axis=-1)
            l = jnp.where(bad[..., None], 0.0, l)
            fs = film.add_samples(fs, pixel_xy, l, swl, weight)
            return fs, None

        film_state, _ = jax.lax.scan(
            one_sample, film_state, sample_indices
        )
        return film_state

    return jax.jit(render_samples)


def render(
    scene: Scene,
    camera,
    film: RgbFilm,
    sampler,
    integrator: str = "path",
    spp: int | None = None,
    max_depth: int = 5,
    wave_spp: int = 4,
    regularize: bool = False,
    integrator_options: dict | None = None,
    film_state: FilmState | None = None,
    progress=None,
):
    """Full render: wave loop on host, one jitted program per wave size.

    Returns the resolved (H, W, 3) image and the final FilmState."""
    spp = spp if spp is not None else sampler.samples_per_pixel
    wave_fn = make_wave_renderer(
        scene,
        camera,
        film,
        sampler,
        integrator,
        max_depth,
        regularize,
        integrator_options=integrator_options,
    )
    state = film_state if film_state is not None else film.init_state()
    start = 0
    while start < spp:
        n = min(wave_spp, spp - start)
        idx = jnp.arange(start, start + n, dtype=jnp.uint32)
        state = wave_fn(state, idx)
        start += n
        if progress is not None:
            progress(start, spp)
    image = film.get_image(state)
    return image, state
