"""Round-4 single-session bench battery (one TPU client):

1. Raw traversal sanity at the new defaults (K=4, no sort).
2. Wavefront wave/block after the sampler + film + gather fixes.
3. Headline bench loop at 327k tris (bench.py main math inline).
4. Ganesha-scale 1.3M-tri wave (exercises HBM streaming on-chip).

Writes a summary to stderr; keep everything in ONE process — the axon
tunnel wedges on client churn.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench as B


def wave_bench(n_tris, spp=8, wave_spp=4, block=1 << 16, tag=""):
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    w, h = film.resolution
    B.log(f"[{tag}] scene: {n_tri} tris, rows={scene.triangles.rows8.shape[0]}")
    sampler = ZSobolSampler(spp, (w, h))
    wave_fn = make_wavefront_renderer(
        scene, cam, film, sampler, max_depth=5, with_stats=True
    )
    blocks, valids = pixel_blocks(film, block)
    n_blocks = blocks.shape[0]
    state = film.init_state()
    idx = jnp.arange(wave_spp, dtype=jnp.uint32)
    t0 = time.perf_counter()
    state, st = wave_fn(state, idx, blocks[0], valids[0])
    jax.block_until_ready(state)
    B.log(f"[{tag}] compile+block0: {time.perf_counter()-t0:.1f}s")

    done = wave_spp
    total_rays = float(st["rays"])
    iters = float(st["iters"])
    t0 = time.perf_counter()
    t_first = None
    while done < spp:
        n = min(wave_spp, spp - done)
        idxw = jnp.arange(done, done + n, dtype=jnp.uint32)
        tw = time.perf_counter()
        for b in range(n_blocks):
            state, st = wave_fn(state, idxw, blocks[b], valids[b])
            total_rays += float(st["rays"])
            iters += float(st["iters"])
        jax.block_until_ready(state)
        if t_first is None:
            t_first = time.perf_counter() - tw
            B.log(f"[{tag}] wave of {n} spp x {n_blocks} blocks: {t_first:.2f}s")
        done += n
    dt = time.perf_counter() - t0
    timed_rays = total_rays - float(st["rays"]) * 0  # all but block0 count
    # exclude block0 (compile run) rays from the timed set
    mrays = (total_rays - total_rays / max(done // wave_spp, 1) * 0) / dt / 1e6
    # simpler: rays traced in the timed loop only:
    img = film.get_image(state)
    mean = float(jnp.mean(img))
    B.log(
        f"[{tag}] {done-wave_spp} timed spp in {dt:.2f}s, iters/block "
        f"{iters/((done//wave_spp)*n_blocks):.1f}, image mean {mean:.4f}"
    )
    timed_rays = total_rays * (done - wave_spp) / done
    B.log(
        f"[{tag}] ≈{timed_rays/1e6:.1f}M rays / {dt:.2f}s = "
        f"{timed_rays/dt/1e6:.3f} Mrays/s"
    )
    return timed_rays / dt / 1e6


def main():
    from shimmer_tpu.ops.pallas import traverse as TR

    scene, cam, film, n_tri = B.build_bench_scene(
        int(os.environ.get("BENCH_TRIS", "300000"))
    )
    n = 1 << 17
    rng = np.random.default_rng(0)
    w, h = film.resolution
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
    )
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    tris = scene.triangles
    fn = jax.jit(lambda o, d: TR.traverse_packets_raw(tris, o, d, jnp.inf))
    for name, o, d in (
        ("primary", ray.o, ray.d),
        ("bounce", jnp.asarray(pts * 1.05), jnp.asarray(dirs)),
    ):
        r = fn(o, d)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for k in range(3):
            r = fn(o + 1e-5 * k, d)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 3
        B.log(f"raw {name} K=4 nosort: {dt*1e3:7.2f} ms {n/dt/1e6:6.2f} Mrays/s")
    del scene, cam, film, tris, fn, r

    m1 = wave_bench(int(os.environ.get("BENCH_TRIS", "300000")), tag="327k")
    m1b = wave_bench(
        int(os.environ.get("BENCH_TRIS", "300000")),
        spp=16, wave_spp=8, tag="327k-spp8",
    )
    m2 = wave_bench(1310720, spp=4, wave_spp=4, tag="1.3M-stream")
    B.log(
        f"SUMMARY: 327k={m1:.3f}, 327k-w8={m1b:.3f}, 1.3M={m2:.3f} Mrays/s"
    )


if __name__ == "__main__":
    main()
