"""On-chip ABAB: K=4 vs K=8 interleaved chains on the HBM-streaming path.

The r4 K sweep (K=2: 5.55, K=4: 6.93, K=8: 7.16 Mrays/s) was measured
VMEM-resident; streamed visits stall on per-visit DMA latency, which
more chains could hide.  1.3M-tri scene (node table > 110 MB budget),
raw streamed traversal, primary + bounce, ABAB by monkeypatching
T.K_PACKETS (read at call time by traverse_packets_raw/_traverse_call)
+ jax.clear_caches().
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

    scene, cam, film, n_tri = B.build_bench_scene(1310720)
    tris = scene.triangles
    tiles = tris.tiles8.shape[0]
    print(f"tiles={tiles} table={tiles * 4096 >> 20}MB "
          f"budget={T.VMEM_TABLE_BYTES >> 20}MB", flush=True)

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

    results = {}
    for pass_i, kk in enumerate((4, 8, 4, 8)):
        T.K_PACKETS = kk
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
            reps = 3
            for k in range(reps):
                r = fn(o + 1e-5 * k, d)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            mray = n / dt / 1e6
            print(f"[K={kk} #{pass_i}] stream {name}: {mray:8.3f} Mrays/s",
                  flush=True)
            results.setdefault((kk, name), []).append(mray)
    for nm in ("primary", "bounce"):
        a = results[(4, nm)]
        b = results[(8, nm)]
        print(f"STREAM SPEEDUP {nm} K8: {max(b)/max(a):.3f}x "
              f"(K4={[round(x,2) for x in a]} K8={[round(x,2) for x in b]})",
              flush=True)


if __name__ == "__main__":
    main()
