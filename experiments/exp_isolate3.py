"""Bisect traverse_packets_raw overhead vs the bare pallas_call,
all in one process on identical rays."""
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


def honest(f, args, reps=5, warmup=2):
    out = None
    for r in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    w, h = film.resolution
    B.log(f"scene ready ({n_tri} tris) K={T.K_PACKETS}")

    N = 131072
    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    px = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(px, jnp.zeros((N, 2), np.float32))
    o = jax.device_put(ray.o)
    d = jax.device_put(ray.d)
    tmax = jax.device_put(jnp.full((N,), jnp.inf))
    jax.block_until_ready((o, d, tmax))

    # device-resident copies of the tables
    meta_dev = jax.device_put(jnp.asarray(tris.meta))
    tiles_dev = jax.device_put(jnp.asarray(tris.tiles8))
    jax.block_until_ready((meta_dev, tiles_dev))
    B.log(f"table types: meta={type(tris.meta).__name__} "
          f"tiles8={type(tris.tiles8).__name__}")

    def pack(o, d, tm):
        K = T.K_PACKETS
        kp = K * 128
        g = max(1, -(-N // kp)) * K
        want = jnp.zeros((N,), jnp.float32)
        lanes = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2], tm, want], 0)
        return jnp.transpose(lanes.reshape(8, g, 128), (1, 0, 2))

    # 1. pack only
    f_pack = jax.jit(lambda o, d, tm: pack(o, d, tm).sum())
    dt = honest(f_pack, (o, d, tmax))
    B.log(f"pack only              : {dt*1e3:8.2f} ms")

    # 2. kernel on device tables, prepacked rays
    rays = jax.jit(pack)(o, d, tmax)
    jax.block_until_ready(rays)
    ss = int(tris.stack_depth) + 8
    f_k = jax.jit(lambda r: T._traverse_call(
        meta_dev, tiles_dev, r, stack_size=ss, interpret=False))
    out = f_k(rays)
    steps = float(jnp.sum(out[:, 2, 0])) / out.shape[0] * T.K_PACKETS
    dt = honest(f_k, (rays,))
    B.log(f"kernel prepacked devtab: {dt*1e3:8.2f} ms  steps/grid={steps:.1f}")

    # 3. kernel on tris-attribute tables (as the wrapper passes them)
    f_k2 = jax.jit(lambda r: T._traverse_call(
        tris.meta, tris.tiles8, r, stack_size=ss, interpret=False))
    out = f_k2(rays)
    steps = float(jnp.sum(out[:, 2, 0])) / out.shape[0] * T.K_PACKETS
    dt = honest(f_k2, (rays,))
    B.log(f"kernel prepacked tristb: {dt*1e3:8.2f} ms  steps/grid={steps:.1f}")

    # 4. pack + kernel
    f_pk = jax.jit(lambda o, d, tm: T._traverse_call(
        tris.meta, tris.tiles8, pack(o, d, tm),
        stack_size=ss, interpret=False)[:, 0].sum())
    dt = honest(f_pk, (o, d, tmax))
    B.log(f"pack+kernel            : {dt*1e3:8.2f} ms")

    # 5. full raw (sort off / on)
    f_r0 = jax.jit(lambda o, d, tm: T.traverse_packets_raw(
        tris, o, d, tm, sort_rays=False)[0].sum())
    dt = honest(f_r0, (o, d, tmax))
    B.log(f"raw sort=0             : {dt*1e3:8.2f} ms")
    f_r1 = jax.jit(lambda o, d, tm: T.traverse_packets_raw(
        tris, o, d, tm, sort_rays=True)[0].sum())
    dt = honest(f_r1, (o, d, tmax))
    B.log(f"raw sort=1             : {dt*1e3:8.2f} ms")

    # 6. full scene_intersect
    from shimmer_tpu.scene import scene_intersect
    f_si = jax.jit(lambda o, d, tm: scene_intersect(scene, o, d, tm).t.sum())
    dt = honest(f_si, (o, d, tmax))
    B.log(f"scene_intersect        : {dt*1e3:8.2f} ms")

    # 7. scene_intersect with want_any array (wavefront-style)
    wa = jnp.zeros((N,), bool)
    f_sw = jax.jit(lambda o, d, tm, wa: scene_intersect(
        scene, o, d, tm, want_any=wa).t.sum())
    dt = honest(f_sw, (o, d, tmax, wa))
    B.log(f"scene_intersect wa-arr : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
