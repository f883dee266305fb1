"""Round-4 consolidated on-chip measurement (single TPU client — the
tunnel dislikes back-to-back client processes):

A. Raw packet traversal: primary vs bounce at K_PACKETS in {2, 4, 8}.
B. Wavefront wave per block + iteration count → body-vs-trace split.
C. Body-component micro-timings at wave lane count: sampler draws,
   light NEE prepare, bsdf sample/pdf, film scatter, regen prefix-sum.

Env: BENCH_TRIS (default 300000).
"""
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


def honest(f, args_of, reps=3, warmup=1):
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
    from shimmer_tpu.ops.pallas import traverse as TR
    from shimmer_tpu.scene import scene_intersect
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    w, h = film.resolution
    B.log(f"scene ready: {n_tri} tris, rows={tris.rows8.shape[0]}")

    n = 1 << 17
    rng = np.random.default_rng(0)
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
    )
    o_pri, d_pri = ray.o, ray.d
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    o_bnc = jnp.asarray(pts * 1.05)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d_bnc = jnp.asarray(dirs)
    inf = jnp.full((n,), jnp.inf)

    # --- A: K_PACKETS sweep on the raw kernel -------------------------
    for K in (2, 4, 8):
        TR.K_PACKETS = K
        TR._traverse_call.clear_cache()
        fn = jax.jit(
            lambda o, d: TR.traverse_packets_raw(tris, o, d, jnp.inf)
        )
        for name, o, d in (("primary", o_pri, d_pri), ("bounce", o_bnc, d_bnc)):
            dt, _ = honest(fn, lambda r, o=o, d=d: (o + 1e-5 * r, d))
            B.log(f"A K={K} {name}: {dt*1e3:7.2f} ms  {n/dt/1e6:6.2f} Mrays/s")
    TR.K_PACKETS = 2
    TR._traverse_call.clear_cache()

    # --- B: full wavefront wave + iters -------------------------------
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
    B.log(f"B wave compile+block0: {time.perf_counter()-t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    tot_rays = tot_iters = 0.0
    for r in range(1, 1 + reps):
        state, st = wave_fn(state, idx, blocks[r], valids[r])
        tot_rays += float(st["rays"])
        tot_iters += float(st["iters"])
    jax.block_until_ready(state)
    dt_wave = (time.perf_counter() - t0) / reps
    B.log(
        f"B wave/block: {dt_wave*1e3:8.1f} ms, {tot_rays/reps/1e6:.2f}M rays "
        f"-> {tot_rays/reps/dt_wave/1e6:.2f} Mrays/s, iters={tot_iters/reps:.1f}"
        f" -> {dt_wave/max(tot_iters/reps,1)*1e3:.1f} ms/iter"
    )

    # merged trace cost at body lane count (2N = 131072)
    si0 = jax.jit(lambda o, d: scene_intersect(scene, o, d, jnp.inf))(
        o_pri, d_pri
    )
    hitp = jnp.where(si0.valid[:, None], si0.p, o_pri) + 1e-4 * d_bnc
    wa2 = jnp.asarray(np.arange(n) >= n // 2)
    dead = jnp.asarray(rng.random(n) < 0.3)
    tmix = jnp.where(dead, -jnp.inf, jnp.inf)
    f_tr = jax.jit(
        lambda o, d: scene_intersect(scene, o, d, tmix, want_any=wa2).t.sum()
    )
    dt_tr, _ = honest(f_tr, lambda r: (hitp + 1e-5 * r, d_bnc))
    B.log(
        f"B merged mixed trace {n} lanes: {dt_tr*1e3:8.2f} ms "
        f"-> body ≈ {dt_wave/max(tot_iters/reps,1)*1e3 - dt_tr*1e3:.1f} ms/iter"
    )

    # --- C: body components at N = 65536 lanes -------------------------
    N = 1 << 16
    oN, dN = o_pri[:N], d_pri[:N]
    px = jnp.asarray(
        np.stack([np.arange(N) % w, (np.arange(N) // w) % h], -1), jnp.int32
    )

    sstate = sampler.start_pixel_sample(px, jnp.uint32(1))

    def draws(ph, si_, dim):
        from shimmer_tpu.samplers import SamplerState

        s = SamplerState(pixel_hash=ph, sample_index=si_, dim=dim)
        tot = jnp.zeros(N)
        for _ in range(4):
            u, s = sampler.get_1d(s)
            u2, s = sampler.get_2d(s)
            tot = tot + u + u2.sum(-1)
        return tot.sum()

    dt, _ = honest(
        jax.jit(draws),
        lambda r: (sstate.pixel_hash + r, sstate.sample_index, sstate.dim),
    )
    B.log(f"C sampler 4x(1d+2d) draws @{N}: {dt*1e3:8.2f} ms")

    si = jax.jit(lambda o, d: scene_intersect(scene, o, d, jnp.inf))(oN, dN)

    from shimmer_tpu.integrators.path import (
        _bsdf_ctx,
        _prepare_hit,
        _with_rng_key,
        sample_ld_prepare,
    )
    from shimmer_tpu.materials.material import bsdf_pdf, bsdf_sample
    from shimmer_tpu.spectra.sampled import SampledWavelengths

    def shade(u_lam, uv):
        swl = SampledWavelengths.sample_uniform(u_lam)
        si2 = _prepare_hit(scene, si, dN, 0.0)
        frame = si2.shading_frame()
        ctx = _bsdf_ctx(scene, si2, swl)
        ctx = _with_rng_key(scene, ctx, sstate)
        ld, (sho, shd, shtm, us), s2 = sample_ld_prepare(
            scene, si2, frame, swl, sampler, sstate, ctx
        )
        bs = bsdf_sample(
            scene.materials, scene.material_kinds, si2.material_id,
            frame, si2.ns, si2.wo, uv, u_lam, swl, **ctx,
        )
        pb = bsdf_pdf(
            scene.materials, scene.material_kinds, si2.material_id,
            frame, si2.ns, si2.wo, bs.wi, swl, **ctx,
        )
        return ld.sum() + bs.f.sum() + pb.sum() + sho.sum() + shd.sum()

    u_lam = jnp.asarray(rng.random(N, dtype=np.float32))
    uv = jnp.asarray(rng.random((N, 2), dtype=np.float32))
    dt, _ = honest(jax.jit(shade), lambda r: (u_lam * (1 - 1e-6 * r), uv))
    B.log(f"C shade (NEE prep + bsdf sample/pdf) @{N}: {dt*1e3:8.2f} ms")

    from shimmer_tpu.spectra.sampled import SampledWavelengths as SWL

    fs0 = film.init_state()
    lrad = jnp.asarray(rng.random((N, 4), dtype=np.float32))
    wgt = jnp.ones(N)

    def fadd(lam_u):
        swl = SWL.sample_uniform(lam_u)
        fs = film.add_samples(fs0, px, lrad, swl, wgt)
        return fs.rgb_sum.sum()

    dt, _ = honest(jax.jit(fadd), lambda r: (u_lam * (1 - 1e-6 * r),))
    B.log(f"C film.add_samples @{N}: {dt*1e3:8.2f} ms")

    def regen_like(fr):
        free = fr > 0.5
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        item = jnp.clip(rank, 0, N - 1)
        return (px[item % N].sum() + item.sum()).astype(jnp.float32)

    fr = jnp.asarray(rng.random(N, dtype=np.float32))
    dt, _ = honest(jax.jit(regen_like), lambda r: (fr * (1 - 1e-6 * r),))
    B.log(f"C regen cumsum+gather @{N}: {dt*1e3:8.2f} ms")

    # camera ray gen (regen also pays this)
    def camgen(u):
        from shimmer_tpu.film.filters import get_camera_sample

        pf, wt, ul = get_camera_sample(film.filter, px, u, u)
        r = cam.generate_ray(pf, ul)
        return r.o.sum() + r.d.sum() + wt.sum()

    dt, _ = honest(jax.jit(camgen), lambda r: (uv * (1 - 1e-6 * r),))
    B.log(f"C camera sample+ray @{N}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
