"""Isolate trace cost components at wavefront lane counts.

Raw traverse_packets (sort on/off) vs full scene_intersect, at 131k and
1M lanes, primary vs bounce rays.  Run with SHIMMER_KPACKETS to tune K.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from shimmer_tpu.ops.pallas.traverse import traverse_packets
from shimmer_tpu.scene import scene_intersect


def honest(f, make_args, reps=3, warmup=1):
    out = None
    for r in range(warmup):
        out = f(*make_args(100 + r))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    chk = 0.0
    for r in range(reps):
        out = f(*make_args(r))
        chk += float(jnp.asarray(out).ravel()[0])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, chk


def main():
    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    w, h = film.resolution
    B.log(f"scene ready ({n_tri} tris), K={os.environ.get('SHIMMER_KPACKETS','2')}")
    rng = np.random.default_rng(0)

    for N in (131072, 1 << 20):
        xs = (np.arange(N) % w).astype(np.float32) + 0.5
        ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
        px = jnp.asarray(np.stack([xs, ys], -1))
        ray = cam.generate_ray(px, jnp.zeros((N, 2), np.float32))
        o, d = ray.o, ray.d
        tmax = jnp.full((N,), np.inf)

        f_raw = jax.jit(lambda o, d, tm: traverse_packets(
            tris, o, d, tm, sort_rays=False)[0].sum())
        f_sort = jax.jit(lambda o, d, tm: traverse_packets(
            tris, o, d, tm, sort_rays=True)[0].sum())
        f_full = jax.jit(lambda o, d, tm: scene_intersect(
            scene, o, d, tm).t.sum())

        dt, _ = honest(f_raw, lambda r: (o + 1e-5 * r, d, tmax))
        B.log(f"N={N:8d} primary raw : {dt*1e3:8.2f} ms {N/dt/1e6:7.2f} Mrays/s")
        dt, _ = honest(f_sort, lambda r: (o + 1e-5 * r, d, tmax))
        B.log(f"N={N:8d} primary sort: {dt*1e3:8.2f} ms {N/dt/1e6:7.2f} Mrays/s")
        dt, _ = honest(f_full, lambda r: (o + 1e-5 * r, d, tmax))
        B.log(f"N={N:8d} primary full: {dt*1e3:8.2f} ms {N/dt/1e6:7.2f} Mrays/s")

        # bounce-like
        si = jax.jit(lambda o, d, tm: scene_intersect(scene, o, d, tm))(o, d, tmax)
        ph = np.where(np.asarray(si.valid)[:, None], np.asarray(si.p), np.asarray(o))
        dd = rng.standard_normal((N, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        ph = jnp.asarray(ph) + 1e-4 * jnp.asarray(dd)
        dd = jnp.asarray(dd)
        dt, _ = honest(f_raw, lambda r: (ph + 1e-5 * r, dd, tmax))
        B.log(f"N={N:8d} bounce  raw : {dt*1e3:8.2f} ms {N/dt/1e6:7.2f} Mrays/s")
        dt, _ = honest(f_sort, lambda r: (ph + 1e-5 * r, dd, tmax))
        B.log(f"N={N:8d} bounce  sort: {dt*1e3:8.2f} ms {N/dt/1e6:7.2f} Mrays/s")

        # steps/packet diagnostics
        for lbl, (oo, ddd) in (("primary", (o, d)), ("bounce", (ph, dd))):
            for s in (False, True):
                st = jax.jit(lambda o, d, tm, s=s: traverse_packets(
                    tris, o, d, tm, return_steps=True, sort_rays=s
                )[6][::128].sum())(oo, ddd, tmax)
                n_pk = N // 128
                B.log(f"  steps/packet {lbl} sort={int(s)}: {float(st)/n_pk:7.1f}")


if __name__ == "__main__":
    main()
