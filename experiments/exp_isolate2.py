"""Time the pallas_call alone vs the traverse_packets epilogue, and K sweep.

Suspicion: the epilogue (_gather_tri + re-intersection) or per-call
overhead dominates at 131k lanes, not the traversal loop itself.
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
import shimmer_tpu.ops.pallas.traverse as T


def honest(f, make_args, reps=5, warmup=2):
    out = None
    for r in range(warmup):
        out = f(*make_args(100 + r))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*make_args(r))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    w, h = film.resolution
    B.log(f"scene ready ({n_tri} tris)")
    rng = np.random.default_rng(0)

    N = 131072
    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    px = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(px, jnp.zeros((N, 2), np.float32))
    o, d = np.asarray(ray.o), np.asarray(ray.d)
    tmax = np.full((N,), np.inf, np.float32)

    def pack(o, d, tm, K):
        n = N
        kp = K * 128
        g = max(1, -(-n // kp)) * K
        lanes = np.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             tm, np.zeros(n, np.float32)], 0)
        rays = np.transpose(lanes.reshape(8, g, 128), (1, 0, 2))
        return jnp.asarray(rays)

    for K in (1, 2, 4):
        T.K_PACKETS = K
        rays = pack(o, d, tmax, K)
        f = jax.jit(lambda r_: T._traverse_call(
            tris.meta, tris.tiles8, r_, stack_size=int(tris.stack_depth) + 8,
            interpret=False))
        def args(i, rays=rays):
            return (rays + jnp.zeros_like(rays),)  # no perturb; same value
        out = f(rays)
        steps = float(jnp.sum(out[:, 2, 0])) / out.shape[0]
        dt = honest(f, lambda i: (rays,))
        B.log(f"K={K} kernel-only {N} rays: {dt*1e3:8.2f} ms "
              f"{N/dt/1e6:7.2f} Mrays/s  steps/grid={steps*K:7.1f}")

    T.K_PACKETS = 2
    # epilogue alone: gather + re-intersect with winning tri
    from shimmer_tpu.shapes.triangle import _gather_tri, intersect_triangle
    tri = jnp.asarray(rng.integers(0, n_tri, N, dtype=np.int32))
    oj, dj, tj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)

    def epi(tri, o, d, tm):
        _, p0, p1, p2 = _gather_tri(tris, jnp.maximum(tri, 0))
        h2, t2, b0, b1, b2 = intersect_triangle(o, d, tm, p0, p1, p2)
        return t2.sum()

    f_epi = jax.jit(epi)
    dt = honest(f_epi, lambda i: (tri, oj, dj, tj))
    B.log(f"epilogue gather+reintersect {N}: {dt*1e3:8.2f} ms")

    # argsort alone
    keys = jnp.asarray(rng.integers(0, 1 << 27, N, dtype=np.int32))
    f_s = jax.jit(lambda k: jnp.argsort(k).sum())
    dt = honest(f_s, lambda i: (keys,))
    B.log(f"argsort {N}: {dt*1e3:8.2f} ms")
    # gather of rays by order (3 arrays) + inverse scatter
    order = jnp.argsort(keys)
    f_g = jax.jit(lambda o_, d_, t_, ord_: (o_[ord_].sum() + d_[ord_].sum()
                                            + t_[ord_].sum()))
    dt = honest(f_g, lambda i: (oj, dj, tj, order))
    B.log(f"3-array reorder gather {N}: {dt*1e3:8.2f} ms")

    N2 = 1 << 20
    keys2 = jnp.asarray(rng.integers(0, 1 << 27, N2, dtype=np.int32))
    dt = honest(f_s, lambda i: (keys2,))
    B.log(f"argsort {N2}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
