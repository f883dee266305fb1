"""Per-phase wavefront cost attribution at production config
(VERDICT r4 item 4: end-to-end is 4.9x below the raw kernel — find the
eaters).  Each phase is jitted standalone at the wave's lane count and
honest-timed; phase_sum x iters is compared against the measured wave.

Phases: merged trace / sampler draws / shade (hit prep + NEE prep +
BSDF sample+pdf) / emission MIS / regen (camera rays + pool ticket) /
film scatter / while-carry overhead (27-array state).
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
    from shimmer_tpu.film.filters import get_camera_sample
    from shimmer_tpu.integrators.path import (
        _area_le_with_mis,
        _bsdf_ctx,
        _infinite_le_with_mis,
        _prepare_hit,
        sample_ld_prepare,
    )
    from shimmer_tpu.materials.material import bsdf_pdf, bsdf_sample
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import SamplerState, ZSobolSampler
    from shimmer_tpu.scene import scene_intersect_merged
    from shimmer_tpu.spectra.sampled import SampledWavelengths

    print(float(jnp.ones((8, 8)).sum()), flush=True)  # probe
    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    w, h = film.resolution
    N = 1 << 17              # production block (lanes)
    spp_wave = 16
    rng = np.random.default_rng(0)

    xs = (np.arange(N) % w).astype(np.float32) + 0.5
    ys = ((np.arange(N) // w) % h).astype(np.float32) + 0.5
    pxf = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(pxf, jnp.zeros((N, 2), np.float32))
    o, d = ray.o, ray.d

    # --- (1) merged trace at 2N lanes (half shadow, ~40% dead) ---
    si0 = jax.jit(
        lambda o, d: scene_intersect_merged(
            scene, jnp.concatenate([o, o]), jnp.concatenate([d, d]),
            jnp.full((2 * N,), np.inf), N,
        )[0]
    )(o, d)
    hitm = np.asarray(si0.valid)
    ph = np.where(hitm[:, None], np.asarray(si0.p), np.asarray(o))
    dd = rng.standard_normal((N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    ph_j = jnp.asarray(ph) + 1e-4 * jnp.asarray(dd)
    dd_j = jnp.asarray(dd)
    dead = jnp.asarray(rng.random(2 * N) < 0.4)
    tmix = jnp.where(dead, -np.inf, np.inf)

    f_tr = jax.jit(
        lambda o, d: scene_intersect_merged(
            scene,
            jnp.concatenate([o, o + 0.01]),
            jnp.concatenate([d, -d]),
            tmix,
            N,
        )[0].t.sum()
    )
    dt_tr = honest(f_tr, lambda r: (ph_j + 1e-5 * r, dd_j))
    print(f"(1) merged trace 2x{N}: {dt_tr*1e3:8.2f} ms", flush=True)

    # --- (2) sampler draws: the body's ~12 dims per iteration ---
    sampler = ZSobolSampler(64, (w, h))
    pxi = jnp.asarray(
        np.stack([xs.astype(np.int32), ys.astype(np.int32)], -1)
    )

    def draws(si_idx):
        st = sampler.start_pixel_sample(pxi, si_idx)
        acc = jnp.zeros(N)
        for _ in range(6):
            u, st = sampler.get_1d(st)
            acc += u
        for _ in range(3):
            u2, st = sampler.get_2d(st)
            acc += u2.sum(-1)
        return acc.sum()

    f_dr = jax.jit(draws)
    dt_dr = honest(f_dr, lambda r: (jnp.uint32(r),))
    print(f"(2) 12 sampler dims {N}: {dt_dr*1e3:8.2f} ms", flush=True)

    # --- (3) shade: prep + NEE prepare + bsdf sample + pdf ---
    si = si0
    swl = SampledWavelengths.sample_uniform(
        jnp.asarray(rng.random(N).astype(np.float32))
    )
    st0 = SamplerState(
        pixel_hash=jnp.zeros(N, jnp.uint32),
        sample_index=jnp.zeros(N, jnp.uint32),
        dim=jnp.zeros(N, jnp.uint32),
    )

    def shade(t_jitter):
        s = si
        s = _prepare_hit(scene, s, d, 0.0)
        frame = s.shading_frame()
        ctx = _bsdf_ctx(scene, s, swl)
        ld, (sh_o, sh_d, sh_tmax, usable), st = sample_ld_prepare(
            scene, s, frame, swl, sampler, st0, ctx
        )
        u2, st = sampler.get_2d(st)
        uc, st = sampler.get_1d(st)
        bs = bsdf_sample(
            scene.materials, scene.material_kinds, s.material_id,
            frame, s.ns, s.wo + t_jitter, u2, uc, swl, **ctx,
        )
        pb = bsdf_pdf(
            scene.materials, scene.material_kinds, s.material_id,
            frame, s.ns, s.wo + t_jitter, bs.wi, swl, **ctx,
        )
        return (ld.sum() + bs.f.sum() + pb.sum() + sh_o.sum())

    f_sh = jax.jit(shade)
    dt_sh = honest(f_sh, lambda r: (1e-6 * r,))
    print(f"(3) shade (NEE+BSDF) {N}: {dt_sh*1e3:8.2f} ms", flush=True)

    # --- (4) emission MIS ---
    def emit(j):
        l = jnp.zeros((N, 4))
        l = _infinite_le_with_mis(
            scene, d + j, swl, jnp.ones((N, 4)), jnp.ones(N),
            jnp.zeros(N, bool), o, d, l, ~si.valid,
        )
        l = _area_le_with_mis(
            scene, si, swl, jnp.ones((N, 4)), jnp.ones(N),
            jnp.zeros(N, bool), o, d, l, si.valid,
        )
        return l.sum()

    f_em = jax.jit(emit)
    dt_em = honest(f_em, lambda r: (1e-6 * r,))
    print(f"(4) emission MIS {N}: {dt_em*1e3:8.2f} ms", flush=True)

    # --- (5) regen: camera sample + ray + ticket ---
    def regen(j):
        free = jnp.asarray(rng.random(N) < 0.4)
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        item = jnp.clip(rank, 0, N - 1)
        p_idx = item % N
        st = sampler.start_pixel_sample(pxi[p_idx], jnp.uint32(1))
        u_lam, st = sampler.get_1d(st)
        swl2 = film.sample_wavelengths(u_lam + j)
        u_f, st = sampler.get_pixel_2d(st)
        u_l, st = sampler.get_2d(st)
        p_film, wgt, u_l = get_camera_sample(film.filter, pxi[p_idx], u_f, u_l)
        r2 = cam.generate_ray(p_film, u_l)
        return r2.o.sum() + r2.d.sum() + wgt.sum() + swl2.lam.sum()

    f_rg = jax.jit(regen)
    dt_rg = honest(f_rg, lambda r: (1e-6 * r,))
    print(f"(5) regen {N}: {dt_rg*1e3:8.2f} ms", flush=True)

    # --- (6) film scatter tail (per wave, not per iter) ---
    def film_tail(j):
        out_rgb = jnp.zeros((N, 3)) + j
        fs = film.init_state()
        return fs.rgb_sum.at[
            pxi[:, 1], pxi[:, 0]
        ].add(out_rgb).sum()

    f_fl = jax.jit(film_tail)
    dt_fl = honest(f_fl, lambda r: (1e-6 * r,))
    print(f"(6) film scatter {N}: {dt_fl*1e3:8.2f} ms", flush=True)

    # --- (7) while-carry overhead: trivial body over a 27-array state ---
    arrs = [jnp.zeros((N, 3)) for _ in range(8)] + [
        jnp.zeros((N, 4)) for _ in range(5)
    ] + [jnp.zeros(N) for _ in range(10)] + [
        jnp.zeros(N, jnp.int32) for _ in range(4)
    ]

    def carry_loop(n_it):
        def body(c):
            i, st = c
            return (i + 1, tuple(a + 1 for a in st))

        def cond(c):
            return c[0] < n_it

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), tuple(arrs)))
        return st[0].sum()

    f_cl = jax.jit(carry_loop)
    it_probe = 50
    dt_cl = honest(f_cl, lambda r: (jnp.int32(it_probe + (r % 2)),))
    print(
        f"(7) while-carry {len(arrs)} arrays x {it_probe} iters: "
        f"{dt_cl*1e3:8.2f} ms ({dt_cl/it_probe*1e3:.2f} ms/iter)",
        flush=True,
    )

    # --- (8) the full wave for comparison ---
    wave_fn = make_wavefront_renderer(
        scene, cam, film, ZSobolSampler(64, (w, h)), max_depth=5,
        with_stats=True,
    )
    blocks, valids = pixel_blocks(film, N)
    state = film.init_state()
    idx = jnp.arange(spp_wave, dtype=jnp.uint32)
    t0 = time.perf_counter()
    state, stt = wave_fn(state, idx, blocks[0], valids[0])
    jax.block_until_ready(state)
    print(f"wave compile+block0: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, stt = wave_fn(state, idx, blocks[1 % len(blocks)], valids[1 % len(blocks)])
    jax.block_until_ready(state)
    dt_wave = time.perf_counter() - t0
    iters = float(stt["iters"])
    rays = float(stt["rays"])
    per_iter = (dt_tr + dt_dr + dt_sh + dt_em + dt_rg)
    print(
        f"(8) WAVE: {dt_wave*1e3:.1f} ms, iters={iters:.0f}, "
        f"rays={rays/1e6:.2f}M -> {rays/dt_wave/1e6:.2f} Mrays/s",
        flush=True,
    )
    print(
        f"    phase-sum prediction: {per_iter*1e3:.2f} ms/iter x {iters:.0f}"
        f" = {per_iter*iters*1e3:.1f} ms"
        f" (+carry {dt_cl/it_probe*iters*1e3:.1f} ms"
        f" +film {dt_fl*1e3:.1f} ms)",
        flush=True,
    )
    print(
        "    shares/iter: trace {:.0f}% draws {:.0f}% shade {:.0f}% "
        "emit {:.0f}% regen {:.0f}%".format(
            *[
                100 * x / per_iter
                for x in (dt_tr, dt_dr, dt_sh, dt_em, dt_rg)
            ]
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
