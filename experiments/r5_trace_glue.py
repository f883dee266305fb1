"""Decompose scene_intersect_merged cost at production lane counts:
kernel proper vs the XLA glue around it (dead-lane compaction, ray-row
packing, unsort scatter, interaction build)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def honest(f, make_args, reps=3, warmup=2):
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
    from shimmer_tpu.ops.pallas.traverse import (
        _ROWS_IN,
        K_PACKETS,
        P,
        _traverse_call,
        traverse_packets_raw,
    )
    from shimmer_tpu.scene import scene_intersect_merged
    from shimmer_tpu.shapes.triangle import triangle_interaction_from_raw

    print(float(jnp.ones((8, 8)).sum()), flush=True)
    scene, cam, film, n_tri = B.build_bench_scene(
        int(os.environ.get("BENCH_TRIS", "300000"))
    )
    tris = scene.triangles
    w, h = film.resolution
    N = 1 << 17
    rng = np.random.default_rng(0)
    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((N, 2), np.float32)
    )
    si_t = jax.jit(
        lambda o, d: traverse_packets_raw(tris, o, d, jnp.inf)
    )(ray.o, ray.d)
    hit = np.asarray(si_t[1]) >= 0
    # production-like merged workload: ext half = bounce rays from hits,
    # shadow half = dirs to a fixed point, 40% dead overall
    t_np = np.asarray(si_t[0])
    ph = np.where(
        hit[:, None], np.asarray(ray.o + si_t[0][:, None] * ray.d),
        np.asarray(ray.o),
    )
    dd = rng.standard_normal((N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o2 = jnp.concatenate([jnp.asarray(ph), jnp.asarray(ph) + 0.01])
    d2 = jnp.concatenate([jnp.asarray(dd), -jnp.asarray(dd)])
    dead = jnp.asarray(rng.random(2 * N) < 0.4)
    tmix = jnp.where(dead, -jnp.inf, jnp.inf)
    wa = jnp.arange(2 * N) >= N

    # (a) full merged path (what the wavefront calls)
    f_a = jax.jit(
        lambda o, d: scene_intersect_merged(scene, o, d, tmix, N)[0].t.sum()
    )
    dt = honest(f_a, lambda r: (o2 + 1e-5 * r, d2))
    print(f"(a) scene_intersect_merged      : {dt*1e3:8.2f} ms", flush=True)

    # (b) raw traversal only, default compaction
    f_b = jax.jit(
        lambda o, d: traverse_packets_raw(
            tris, o, d, tmix, any_hit=wa
        )[0].sum()
    )
    dt = honest(f_b, lambda r: (o2 + 1e-5 * r, d2))
    print(f"(b) traverse_packets_raw (cmp)  : {dt*1e3:8.2f} ms", flush=True)

    # (c) raw traversal, no compaction
    f_c = jax.jit(
        lambda o, d: traverse_packets_raw(
            tris, o, d, tmix, any_hit=wa, compact_dead=False
        )[0].sum()
    )
    dt = honest(f_c, lambda r: (o2 + 1e-5 * r, d2))
    print(f"(c) traverse_packets_raw (raw)  : {dt*1e3:8.2f} ms", flush=True)

    # (d) kernel only: pre-packed rays
    n_all = 2 * N
    rays_packed = jnp.zeros((_ROWS_IN, n_all))
    rays_packed = rays_packed.at[6].set(jnp.where(dead, -1.0, 1.0))
    rays_packed = rays_packed.at[0:3].set(o2.T)
    rays_packed = rays_packed.at[3:6].set(d2.T)
    f_d = jax.jit(
        lambda rp: _traverse_call(
            tris.meta, tris.tiles8, rp,
            stack_size=int(tris.stack_depth) + 8, interpret=False,
        ).sum()
    )
    dt = honest(f_d, lambda r: (rays_packed + 1e-6 * r,))
    print(f"(d) kernel only (prepacked)     : {dt*1e3:8.2f} ms", flush=True)

    # (e) interaction build on the ext half
    t_e, tri_e = jax.jit(
        lambda o, d: traverse_packets_raw(tris, o, d, jnp.inf)
    )(o2[:N], d2[:N])
    f_e = jax.jit(
        lambda o, d: triangle_interaction_from_raw(
            tris, o, d, tri_e
        ).p.sum()
    )
    dt = honest(f_e, lambda r: (o2[:N] + 1e-5 * r, d2[:N]))
    print(f"(e) interaction_from_raw (N)    : {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def main2():
    """Correct decomposition: (f) the lane-packing graph alone, (g) the
    kernel on REAL packed lanes (main's (d) fed zero shear rows - the
    kernel exited after the root visit; its 25 ms is pure dispatch)."""
    from shimmer_tpu.ops.pallas.traverse import (
        _ROWS_IN,
        P,
        _traverse_call,
        traverse_packets_raw,
    )

    import jax
    import jax.numpy as jnp

    print(float(jnp.ones((8, 8)).sum()), flush=True)
    scene, cam, film, n_tri = B.build_bench_scene(
        int(os.environ.get("BENCH_TRIS", "300000"))
    )
    tris = scene.triangles
    w, h = film.resolution
    N = 1 << 17
    rng = np.random.default_rng(0)
    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((N, 2), np.float32)
    )
    si_t = jax.jit(
        lambda o, d: traverse_packets_raw(tris, o, d, jnp.inf)
    )(ray.o, ray.d)
    hit = np.asarray(si_t[1]) >= 0
    ph = np.where(
        hit[:, None], np.asarray(ray.o + si_t[0][:, None] * ray.d),
        np.asarray(ray.o),
    )
    dd = rng.standard_normal((N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o2 = jnp.concatenate([jnp.asarray(ph), jnp.asarray(ph) + 0.01])
    d2 = jnp.concatenate([jnp.asarray(dd), -jnp.asarray(dd)])
    dead = jnp.asarray(rng.random(2 * N) < 0.4)
    tmix = jnp.where(dead, -jnp.inf, jnp.inf)
    wa = jnp.arange(2 * N) >= N

    def pack(ray_o, ray_d, t_max, want):
        dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
        inv_d = 1.0 / jnp.where(ray_d == 0.0, 1e-30, ray_d)
        ad = jnp.abs(ray_d)
        is0 = (ad[:, 0] >= ad[:, 1]) & (ad[:, 0] >= ad[:, 2])
        is1 = (~is0) & (ad[:, 1] >= ad[:, 2])
        pc = jnp.where(is0, 0.0, jnp.where(is1, 1.0, 2.0))
        pdx = jnp.where(is0, dy, jnp.where(is1, dz, dx))
        pdy = jnp.where(is0, dz, jnp.where(is1, dx, dy))
        pdz = jnp.where(is0, dx, jnp.where(is1, dy, dz))
        dz_ok = pdz != 0.0
        pdz_safe = jnp.where(dz_ok, pdz, 1.0)
        return jnp.stack(
            [
                ray_o[:, 0], ray_o[:, 1], ray_o[:, 2], dx, dy, dz,
                t_max, want.astype(jnp.float32),
                inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
                -pdx / pdz_safe, -pdy / pdz_safe, 1.0 / pdz_safe,
                pc, dz_ok.astype(jnp.float32),
            ],
            axis=0,
        )

    f_pack = jax.jit(lambda o, d: pack(o, d, tmix, wa).sum())
    dt = honest(f_pack, lambda r: (o2 + 1e-5 * r, d2))
    print(f"(f) lane packing only           : {dt*1e3:8.2f} ms", flush=True)

    lanes = jax.jit(pack)(o2, d2, tmix, wa)
    f_g = jax.jit(
        lambda rp: _traverse_call(
            tris.meta, tris.tiles8, rp,
            stack_size=int(tris.stack_depth) + 8, interpret=False,
        ).sum()
    )
    dt = honest(f_g, lambda r: (lanes + 1e-6 * r,))
    print(f"(g) kernel on real packed lanes : {dt*1e3:8.2f} ms", flush=True)

    # (h) kernel on all-dead lanes = pure dispatch floor
    lanes_dead = lanes.at[6].set(-1.0)
    dt = honest(f_g, lambda r: (lanes_dead + 1e-6 * r,))
    print(f"(h) kernel, all lanes dead      : {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    if os.environ.get("GLUE2"):
        main2()
    else:
        main()
