"""Follow-up A/B: compaction on/off for raw traversal and the wave."""
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


def main():
    from shimmer_tpu.ops.pallas import traverse as TR
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = B.build_bench_scene(300000)
    tris = scene.triangles
    w, h = film.resolution
    n = 1 << 17
    rng = np.random.default_rng(0)
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
    )
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    half_dead = jnp.asarray(
        np.where(rng.random(n) < 0.6, -np.inf, np.inf).astype(np.float32)
    )

    for comp in (False, True):
        fn = jax.jit(
            lambda o, d, tm, c=comp: TR.traverse_packets_raw(
                tris, o, d, tm, compact_dead=c
            )
        )
        for name, o, d, tm in (
            ("primary ", ray.o, ray.d, jnp.inf),
            ("bounce  ", jnp.asarray(pts * 1.05), jnp.asarray(dirs), jnp.inf),
            ("bounce60d", jnp.asarray(pts * 1.05), jnp.asarray(dirs), half_dead),
        ):
            tm_b = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            r = fn(o, d, tm_b)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for k in range(3):
                r = fn(o + 1e-5 * k, d, tm_b)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 3
            B.log(
                f"compact={int(comp)} {name}: {dt*1e3:7.2f} ms "
                f"{n/dt/1e6:6.2f} Mrays/s"
            )

    # wave A/B
    for comp in ("0", "1"):
        os.environ["SHIMMER_COMPACT"] = comp
        sampler = ZSobolSampler(8, (w, h))
        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=5, with_stats=True
        )
        blocks, valids = pixel_blocks(film, 1 << 16)
        state = film.init_state()
        idx = jnp.arange(4, dtype=jnp.uint32)
        t0 = time.perf_counter()
        state, st = wave_fn(state, idx, blocks[0], valids[0])
        jax.block_until_ready(state)
        B.log(f"wave[c={comp}] compile+b0: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        rays = 0.0
        for b in range(1, 4):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            rays += float(st["rays"])
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / 3
        B.log(
            f"wave[c={comp}]: {dt*1e3:7.1f} ms/block, "
            f"{rays/3/dt/1e6:.3f} Mrays/s, iters={float(st['iters']):.1f}"
        )


if __name__ == "__main__":
    main()
