"""Where does the wavefront wave time go?

Times, on the real bench scene at bench lane counts:
  (a) one merged scene_intersect dispatch (traversal only)
  (b) one full wavefront-style shade iteration via li_path at depth 1
  (c) li_path at full depth (megakernel) for reference
All honest-timed (arguments perturbed per rep).
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


def honest(f, make_args, reps=3, warmup=1):
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
    from shimmer_tpu.scene import scene_intersect
    from shimmer_tpu.integrators.path import li_path
    from shimmer_tpu.samplers import ZSobolSampler
    from shimmer_tpu.film.filters import get_camera_sample

    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    w, h = film.resolution
    B.log(f"scene ready ({n_tri} tris)")

    rng = np.random.default_rng(0)

    for N in (131072, 524288):
        # random rays from the camera-ish region toward the mesh
        o = jnp.asarray(
            rng.uniform(-2, 2, (N, 3)).astype(np.float32)
            + np.array([0, 0.6, -3.2], np.float32)
        )
        d = rng.standard_normal((N, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        tmax = jnp.full((N,), 1e30)

        def f_isect(o, d):
            si = scene_intersect(scene, o, d, tmax)
            return si.t.sum()

        fj = jax.jit(f_isect)
        dt, chk = honest(fj, lambda r: (o + 0.001 * r, d))
        B.log(
            f"scene_intersect N={N}: {dt*1e3:8.1f} ms "
            f"({dt/N*1e9:6.1f} ns/ray) chk={chk:.0f}"
        )

    # full li_path at depths 1..5 on a real camera block
    sampler = ZSobolSampler(8, (w, h))
    from shimmer_tpu.render import pixel_blocks

    blocks, valids = pixel_blocks(film, 1 << 16)
    px, pv = blocks[0], valids[0]
    N = px.shape[0]

    for depth in (0, 1, 2, 5):
        def f_li(sample_index):
            s_state = sampler.start_pixel_sample(px, sample_index)
            u_lam, s_state = sampler.get_1d(s_state)
            swl = film.sample_wavelengths(u_lam)
            u_f, s_state = sampler.get_pixel_2d(s_state)
            u_l, s_state = sampler.get_2d(s_state)
            p_film, wt, _ = get_camera_sample(film.filter, px, u_f, u_l)
            ray = cam.generate_ray(p_film, u_l)
            l, stats = li_path(
                scene, ray, swl, sampler, s_state, depth,
                return_stats=True, alive_mask=pv,
            )
            return jnp.sum(l) + 0 * stats["rays"], stats["rays"]

        fj = jax.jit(f_li)
        dt, chk = honest(fj, lambda r: (jnp.uint32(r),), reps=2)
        rays = float(fj(jnp.uint32(0))[1])
        B.log(
            f"li_path depth={depth} N={N}: {dt*1e3:8.1f} ms  "
            f"rays={rays:.0f}  -> {rays/dt/1e6:6.2f} Mrays/s  chk={chk:.0f}"
        )


if __name__ == "__main__":
    main()
