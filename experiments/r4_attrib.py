"""Round-4 attribution: on-chip steps/packet + ns/step for the Pallas
packet traversal, coherent (primary) vs incoherent (random bounce-like)
rays, with/without Morton sort, at the current K_PACKETS.

Run: SHIMMER_KPACKETS=K python experiments/r4_attrib.py
Env: BENCH_TRIS (default 300000), N_RAYS (default 131072).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench as B


def honest(f, args_of, reps=2, warmup=1):
    out = None
    for r in range(warmup):
        out = f(*args_of(100 + r))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*args_of(r))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from shimmer_tpu.ops.pallas.traverse import K_PACKETS, P, traverse_packets_raw

    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    n = int(os.environ.get("N_RAYS", str(1 << 17)))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    w, h = film.resolution
    B.log(f"scene ready: {n_tri} tris, K_PACKETS={K_PACKETS}, n={n}")

    rng = np.random.default_rng(0)

    # (a) primary rays: coherent, consecutive pixels
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    px = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(px, jnp.zeros((n, 2), np.float32))
    o_pri, d_pri = ray.o, ray.d

    # (b) bounce-like: origins near the sphere surface, random directions
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    o_bnc = jnp.asarray(pts * 1.05)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d_bnc = jnp.asarray(dirs)

    # (c) half-dead bounce batch (wavefront reality: ~50% lanes dead)
    tmax_half = jnp.asarray(
        np.where(rng.random(n) < 0.5, np.inf, -np.inf).astype(np.float32)
    )

    fn = jax.jit(
        lambda o, d, tm, srt: traverse_packets_raw(
            tris, o, d, tm, any_hit=False, return_steps=True, sort_rays=srt
        ),
        static_argnums=(3,),
    )

    inf = jnp.full((n,), jnp.inf)
    for name, o, d, tm in [
        ("primary ", o_pri, d_pri, inf),
        ("bounce  ", o_bnc, d_bnc, inf),
        ("bounce/2", o_bnc, d_bnc, tmax_half),
    ]:
        for srt in (False, True):
            # perturb origins per rep to defeat caching
            def args_of(r, o=o, d=d, tm=tm, srt=srt):
                return (o + 1e-5 * r, d, tm, srt)

            B.log(f"running {name} sort={int(srt)}")
            dt, out = honest(fn, args_of)
            t, tri, steps = out
            steps = np.asarray(steps)
            # steps is per-lane = grid-step's while-iteration count
            per_packet = steps.reshape(-1, P)[:, 0]  # same within packet
            tot_steps = float(per_packet.reshape(-1, K_PACKETS).max(1).sum())
            hit_frac = float(np.mean(np.asarray(tri) >= 0))
            mrays = n / dt / 1e6
            ns_step = dt / max(tot_steps, 1) * 1e9
            print(
                f"{name} sort={int(srt)}: {dt*1e3:7.2f} ms  {mrays:7.2f} Mrays/s  "
                f"steps(mean/max per packet)={per_packet.mean():6.1f}/{per_packet.max():5.0f}  "
                f"grid-steps={tot_steps:9.0f}  ns/step={ns_step:6.1f}  hit={hit_frac:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
