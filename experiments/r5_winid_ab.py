"""On-chip ABAB: leaf-epilogue winner-id by min-reduce vs iota dance.

SHIMMER_WINID_MIN toggled by monkeypatching T.WINID_MIN (read at kernel
trace time) + jax.clear_caches().  Raw batches + production wave, ABAB.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("devices:", jax.devices(), flush=True)
    x = float(jnp.ones((8, 8)).sum())
    print(f"probe ok ({x})", flush=True)

    import bench as B
    import shimmer_tpu.ops.pallas.traverse as T
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = B.build_bench_scene(300000)
    tris = scene.triangles
    n = 1 << 17
    w, h = film.resolution
    rng = np.random.default_rng(1)
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
    )
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o_b = jnp.asarray(pts * 1.05)
    d_b = jnp.asarray(dirs)

    sampler = ZSobolSampler(16, film.resolution)
    blocks, valids = pixel_blocks(film, 1 << 17)
    idx = jnp.arange(16, dtype=jnp.uint32)

    raw_res, wave_res = {}, {}
    for pass_i, variant in enumerate(("iota", "min", "iota", "min")):
        T.WINID_MIN = variant == "min"
        jax.clear_caches()
        fn = jax.jit(
            lambda o, d: T.traverse_packets_raw(
                tris, o, d, jnp.inf, return_steps=True, sort_rays=True
            )
        )
        for name, o, d in (("primary", ray.o, ray.d), ("bounce", o_b, d_b)):
            for k in range(3):
                r = fn(o + 1e-6 * k, d)
            jax.block_until_ready(r)
            t0 = time.time()
            reps = 4
            for k in range(reps):
                r = fn(o + 1e-5 * k, d)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            mray = n / dt / 1e6
            print(f"[{variant} #{pass_i}] raw {name}: {mray:8.3f} Mrays/s",
                  flush=True)
            raw_res.setdefault((variant, name), []).append(mray)

        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=5, with_stats=True
        )
        state = film.init_state()
        t0 = time.time()
        state, st = wave_fn(state, idx, blocks[0], valids[0])
        jax.block_until_ready(state)
        print(f"[{variant} #{pass_i}] wave compile+block0: "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        rays = 0.0
        for b in range(1, 5):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            rays += float(st["rays"])
        jax.block_until_ready(state)
        mr = rays / (time.time() - t0) / 1e6
        mean = float(jnp.mean(film.get_image(state)))
        print(f"[{variant} #{pass_i}] wave: {mr:.3f} Mrays/s "
              f"(img mean {mean:.5f})", flush=True)
        wave_res.setdefault(variant, []).append(mr)
    for nm in ("primary", "bounce"):
        a = raw_res[("iota", nm)]
        b = raw_res[("min", nm)]
        print(f"RAW SPEEDUP {nm} min: {max(b)/max(a):.3f}x "
              f"(iota={[round(x,2) for x in a]} min={[round(x,2) for x in b]})",
              flush=True)
    a, b = wave_res["iota"], wave_res["min"]
    print(f"WAVE SPEEDUP min: {max(b)/max(a):.3f}x "
          f"(iota={[round(x,3) for x in a]} min={[round(x,3) for x in b]})",
          flush=True)


if __name__ == "__main__":
    main()
