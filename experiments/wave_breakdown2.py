"""Post-Pallas wave breakdown: where does a wavefront iteration go?

Times, on the real bench scene at bench lane counts (block=65536 px,
merged trace = 131072 lanes):
  (a) merged scene_intersect: primary rays, bounce rays, half-dead rays
  (b) shade-ish work: bsdf_sample + sample_ld_prepare-style math is
      embedded in the wave; we approximate by timing the full wave_fn
      per block and subtracting measured trace time x iteration count.
  (c) wavefront iteration count per block (from with_stats wave).
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
    from shimmer_tpu.scene import scene_intersect
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    w, h = film.resolution
    B.log(f"scene ready ({n_tri} tris)")
    rng = np.random.default_rng(0)

    N = 131072  # merged trace lanes per wavefront iteration
    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    px = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(px, jnp.zeros((N, 2), np.float32))
    o, d = ray.o, ray.d
    tmax = jnp.full((N,), np.inf)
    wa = jnp.zeros((N,), bool)

    f_tr = jax.jit(
        lambda o, d, tm: scene_intersect(scene, o, d, tm, want_any=wa).t.sum()
    )
    dt, _ = honest(f_tr, lambda r: (o + 1e-5 * r, d, tmax))
    B.log(f"(a1) trace primary   {N} lanes: {dt*1e3:8.2f} ms")

    # bounce-like: hit points + random dirs
    si = jax.jit(lambda o, d, tm: scene_intersect(scene, o, d, tm))(o, d, tmax)
    hit = np.asarray(si.valid)
    ph = np.where(hit[:, None], np.asarray(si.p), np.asarray(o))
    dd = rng.standard_normal((N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    ph = jnp.asarray(ph) + 1e-4 * jnp.asarray(dd)
    dd = jnp.asarray(dd)
    dt, _ = honest(f_tr, lambda r: (ph + 1e-5 * r, dd, tmax))
    B.log(f"(a2) trace bounce    {N} lanes: {dt*1e3:8.2f} ms")

    # realistic merged trace: half closest-hit bounce + half shadow any-hit,
    # ~30% dead lanes
    dead = jnp.asarray(rng.random(N) < 0.3)
    tmix = jnp.where(dead, -np.inf, np.inf)
    wa2 = jnp.asarray(np.arange(N) >= N // 2)
    f_tr2 = jax.jit(
        lambda o, d, tm: scene_intersect(scene, o, d, tm, want_any=wa2).t.sum()
    )
    dt, _ = honest(f_tr2, lambda r: (ph + 1e-5 * r, dd, tmix))
    B.log(f"(a3) trace mixed30%d {N} lanes: {dt*1e3:8.2f} ms")

    # (c) full wave per block with stats
    spp = 4
    sampler = ZSobolSampler(8, (w, h))
    wave_fn = make_wavefront_renderer(
        scene, cam, film, sampler, max_depth=5, with_stats=True
    )
    blocks, valids = pixel_blocks(film, 1 << 16)
    state = film.init_state()
    idx = jnp.arange(spp, dtype=jnp.uint32)
    t0 = time.perf_counter()
    state, st = wave_fn(state, idx, blocks[0], valids[0])
    jax.block_until_ready(state)
    B.log(f"wave compile+block0: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    reps = 3
    tot_rays = 0.0
    for r in range(1, 1 + reps):
        state, st = wave_fn(state, idx, blocks[r], valids[r])
        tot_rays += float(st["rays"])
    jax.block_until_ready(state)
    dt_wave = (time.perf_counter() - t0) / reps
    iters = float(st.get("iters", -1)) if isinstance(st, dict) else -1
    B.log(
        f"(c) wave_fn/block: {dt_wave*1e3:8.1f} ms, rays/block "
        f"{tot_rays/reps/1e6:.2f}M -> {tot_rays/reps/dt_wave/1e6:.2f} Mrays/s,"
        f" iters={iters}"
    )


if __name__ == "__main__":
    main()
