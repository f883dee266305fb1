"""Multi-chip rendering: tile/spp sharding over a device mesh.

TPU-native replacement for the reference's rayon tile parallelism
(/root/reference/src/integrator.rs:235-304) and the distributed layer the
reference lacks (SURVEY.md §2 parallelism table): pixel *rows* are sharded
across chips with ``shard_map`` over a ("tiles",) mesh — each chip owns a
contiguous row band of the film, renders only its pixels, and scatter-adds
into its film shard.  No collectives run inside a wave (rays are
independent); the only communication is the implicit all-gather when the
sharded film is resolved to an image — the analog of the reference's
lock-free disjoint-tile writes, made safe by construction.

spp sharding (``axis='spp'``) instead gives every chip the full image with
a sample-index offset and psums film states at wave end — the cross-host
reduction path in BASELINE.json's north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shimmer_tpu.film.film import FilmState, RgbFilm
from shimmer_tpu.render import INTEGRATORS, render_pixel_samples


def make_tile_mesh(devices=None, axis: str = "tiles") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_wave_renderer(
    scene,
    camera,
    film: RgbFilm,
    sampler,
    mesh: Mesh,
    integrator: str = "path",
    max_depth: int = 5,
    mode: str = "tiles",
    integrator_options: dict | None = None,
    wavefront: bool | None = None,
):
    """Build the sharded per-wave render function.

    mode="tiles": film rows sharded over the mesh axis; film state must be
    created with :func:`init_sharded_film_state`.
    mode="spp":  film replicated; each device renders every pixel for a
    disjoint slice of sample indices; states are psummed.
    wavefront: None = use the regenerating wavefront (the production
    integrator, see integrators/wavefront.py) whenever the estimator is
    the full path integrator; False forces the masked megakernel.
    """
    li_fn = INTEGRATORS[integrator]
    opts = dict(integrator_options or {})
    use_wavefront = (
        integrator == "path" and not opts if wavefront is None else wavefront
    )
    if use_wavefront:
        from shimmer_tpu.integrators.wavefront import render_wave_wavefront

    w, h = film.resolution
    n_dev = mesh.shape[mesh.axis_names[0]]
    axis = mesh.axis_names[0]
    assert h % n_dev == 0, f"film height {h} not divisible by {n_dev} devices"
    rows_per = h // n_dev

    def _device_render(film_state, sample_indices, pixel_xy, local_film):
        if use_wavefront:
            return render_wave_wavefront(
                scene, camera, local_film, sampler, film_state,
                sample_indices, pixel_xy, None, max_depth=max_depth,
            )
        return render_pixel_samples(
            scene, camera, local_film, sampler, li_fn, opts, film_state,
            sample_indices, pixel_xy, max_depth=max_depth,
        )

    if mode == "tiles":

        def wave_body(film_state: FilmState, sample_indices):
            # Each device renders its row band into its (rows_per, W) shard.
            band = jax.lax.axis_index(axis) * rows_per
            ys, xs = jnp.meshgrid(
                jnp.arange(rows_per, dtype=jnp.int32),
                jnp.arange(w, dtype=jnp.int32),
                indexing="ij",
            )
            # Global pixel coords for camera rays + sampler seeding...
            pixel_global = jnp.stack(
                [xs.reshape(-1), (ys + band).reshape(-1)], axis=-1
            )
            # ...but film scatter uses shard-local row indices.
            local_film = LocalBandFilm(film, band)
            return _device_render(
                film_state, sample_indices, pixel_global, local_film
            )

        return jax.jit(
            jax.shard_map(
                wave_body,
                mesh=mesh,
                in_specs=(
                    FilmState(
                        rgb_sum=P(axis), weight_sum=P(axis), rgb_splat=P(axis)
                    ),
                    P(),
                ),
                out_specs=FilmState(
                    rgb_sum=P(axis), weight_sum=P(axis), rgb_splat=P(axis)
                ),
                check_vma=False,
            )
        )

    if mode == "spp":
        from shimmer_tpu.render import full_image_pixels

        pixel_xy = full_image_pixels(film)

        def wave_body(film_state: FilmState, sample_indices):
            # sample_indices: (D, n_wave) sharded — each device gets a slice.
            my = sample_indices.reshape(-1)
            fs = _device_render(film_state, my, pixel_xy, film)
            # Cross-chip film reduction (the psum over ICI in BASELINE.json).
            return jax.tree.map(lambda x: jax.lax.psum(x, axis), fs)

        return jax.jit(
            jax.shard_map(
                wave_body,
                mesh=mesh,
                in_specs=(
                    FilmState(rgb_sum=P(), weight_sum=P(), rgb_splat=P()),
                    P(axis),
                ),
                out_specs=FilmState(rgb_sum=P(), weight_sum=P(), rgb_splat=P()),
                check_vma=False,
            )
        )

    raise ValueError(f"unknown mode: {mode}")


class LocalBandFilm:
    """Film view whose scatter indices are shard-local rows."""

    def __init__(self, film: RgbFilm, band_row0):
        self._film = film
        self._band = band_row0

    def __getattr__(self, name):
        return getattr(self._film, name)

    def local_xy(self, pixel_xy):
        return jnp.stack(
            [pixel_xy[..., 0], pixel_xy[..., 1] - self._band], axis=-1
        )

    def add_samples(self, state, pixel_xy, l, swl, weight, unique=False):
        return self._film.add_samples(
            state, self.local_xy(pixel_xy), l, swl, weight, unique=unique
        )


def init_sharded_film_state(film: RgbFilm, mesh: Mesh) -> FilmState:
    axis = mesh.axis_names[0]
    state = film.init_state()
    spec = FilmState(rgb_sum=P(axis), weight_sum=P(axis), rgb_splat=P(axis))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state,
        spec,
    )


def render_sharded(
    scene,
    camera,
    film: RgbFilm,
    sampler,
    mesh: Mesh | None = None,
    integrator: str = "path",
    spp: int | None = None,
    max_depth: int = 5,
    wave_spp: int = 4,
    mode: str = "tiles",
    integrator_options: dict | None = None,
    wavefront: bool | None = None,
):
    """Multi-chip render loop; same contract as shimmer_tpu.render.render."""
    mesh = mesh or make_tile_mesh()
    spp = spp if spp is not None else sampler.samples_per_pixel
    wave_fn = make_sharded_wave_renderer(
        scene, camera, film, sampler, mesh, integrator, max_depth, mode,
        integrator_options, wavefront=wavefront,
    )
    n_dev = mesh.shape[mesh.axis_names[0]]
    if mode == "tiles":
        state = init_sharded_film_state(film, mesh)
        start = 0
        while start < spp:
            n = min(wave_spp, spp - start)
            idx = jnp.arange(start, start + n, dtype=jnp.uint32)
            state = wave_fn(state, idx)
            start += n
    else:  # spp mode: pad spp to a multiple of devices
        state = film.init_state()
        start = 0
        while start < spp:
            n = min(wave_spp * n_dev, spp - start)
            n = max(n_dev, (n // n_dev) * n_dev)
            idx = jnp.arange(start, start + n, dtype=jnp.uint32).reshape(n_dev, -1)
            state = wave_fn(state, idx)
            start += n
    image = film.get_image(state)
    return image, state
