"""Attribute the packet-kernel per-step cost.

Runs a FIXED count of loop iterations of the real step body with pieces
disabled (semantics intentionally garbage — we only time the step):
  full      : the real body (internal + leaf + stack + bits)
  noroll    : fetch without the dynamic lane roll
  noleaf    : leaf math removed
  noint     : internal slab math removed (bits constant)
  nobits    : vector->scalar bits extraction replaced by a constant
  noscalar  : stack/meta scalar chain removed (fixed r sequence)
Marginal = full - variant.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench as B
from shimmer_tpu.ops.math import difference_of_products

P = 128
STEPS = 256
K = int(os.environ.get("SHIMMER_KPACKETS", "2"))


def _permute3(x, y, z, is0, is1):
    ox = jnp.where(is0, y, jnp.where(is1, z, x))
    oy = jnp.where(is0, z, jnp.where(is1, x, y))
    oz = jnp.where(is0, x, jnp.where(is1, y, z))
    return ox, oy, oz


def kern(meta_hbm, rays_ref, tab_hbm, out_ref, stack_ref, tab_ref,
         meta_ref, tab_sem, meta_sem, *, variant, n_rows, stack_size):
    @pl.when(pl.program_id(0) == 0)
    def _():
        c1 = pltpu.make_async_copy(tab_hbm, tab_ref, tab_sem)
        c2 = pltpu.make_async_copy(meta_hbm, meta_ref, meta_sem)
        c1.start(); c2.start(); c1.wait(); c2.wait()

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    pow2 = (1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))

    def fetch(r):
        tile = tab_ref[r >> 3]
        if variant == "noroll":
            return tile
        return pltpu.roll(tile, (128 - ((r & 7) << 4)) & 127, axis=1)

    def fld(tile, c):
        return jnp.broadcast_to(tile[:, c : c + 1], (8, P))

    def ray_of(k):
        rays = rays_ref[k]
        return (rays[0:1], rays[1:2], rays[2:3], rays[3:4], rays[4:5],
                rays[5:6], rays[6:7], rays[7:8] > 0.0)

    def inv_of(k):
        rays = rays_ref[k]
        return rays[8:9], rays[9:10], rays[10:11]

    def shear_of(k):
        rays = rays_ref[k]
        pc = rays[14:15]
        return (pc < 0.5, (pc >= 0.5) & (pc < 1.5),
                rays[11:12], rays[12:13], rays[13:14], rays[15:16] > 0.0)

    def internal_step(k, tile, t_best, active):
        ox, oy, oz, *_ = ray_of(k)
        inv_x, inv_y, inv_z = inv_of(k)
        t0x = (fld(tile, 0) - ox) * inv_x
        t1x = (fld(tile, 3) - ox) * inv_x
        t0y = (fld(tile, 1) - oy) * inv_y
        t1y = (fld(tile, 4) - oy) * inv_y
        t0z = (fld(tile, 2) - oz) * inv_z
        t1z = (fld(tile, 5) - oz) * inv_z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        hit8 = ((tn <= tf * 1.0001) & (tf > 0.0) & (tn < t_best)
                & (fld(tile, 6) > 0.0) & (active > 0.0))
        any8 = jnp.any(hit8, axis=1, keepdims=True)
        return jnp.sum(jnp.where(any8, pow2, 0))

    def leaf_step(k, tile, cnt, t_best, tri, active, live):
        ox, oy, oz, dx, dy, dz, _tm, want_any = ray_of(k)
        is0, is1, sx, sy, sz, dz_ok = shear_of(k)
        v = tuple(fld(tile, c) for c in range(9))
        ids = fld(tile, 9)
        a0 = (v[0] - ox, v[1] - oy, v[2] - oz)
        a1 = (v[3] - ox, v[4] - oy, v[5] - oz)
        a2 = (v[6] - ox, v[7] - oy, v[8] - oz)
        q0 = _permute3(*a0, is0, is1)
        q1 = _permute3(*a1, is0, is1)
        q2 = _permute3(*a2, is0, is1)
        x0 = q0[0] + sx * q0[2]; y0 = q0[1] + sy * q0[2]
        x1 = q1[0] + sx * q1[2]; y1 = q1[1] + sy * q1[2]
        x2 = q2[0] + sx * q2[2]; y2 = q2[1] + sy * q2[2]
        e0 = difference_of_products(x1, y2, y1, x2)
        e1 = difference_of_products(x2, y0, y2, x0)
        e2 = difference_of_products(x0, y1, y0, x1)
        same_sign = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                     | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
        det = e0 + e1 + e2
        det_ok = det != 0.0
        ts = e0 * (q0[2] * sz) + e1 * (q1[2] * sz) + e2 * (q2[2] * sz)
        neg = det < 0.0
        t_ok = ((neg & (ts <= 1e-7 * det) & (ts > t_best * det))
                | ((~neg) & (ts >= 1e-7 * det) & (ts < t_best * det)))
        slot_ok = iota8 < cnt
        hit = (same_sign & det_ok & t_ok & dz_ok & slot_ok
               & (active > 0.0) & live)
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        t = jnp.where(hit, ts * inv_det, jnp.inf)
        tmin = jnp.min(t, axis=0, keepdims=True)
        closer = tmin < t_best
        cand = jnp.where(t == tmin, iota8, 8)
        sel = jnp.min(cand, axis=0, keepdims=True)
        oh = iota8 == sel
        win_id = jnp.sum(jnp.where(oh, ids, 0.0), axis=0, keepdims=True)
        t_best = jnp.where(closer, tmin, t_best)
        tri = jnp.where(closer, win_id, tri)
        active = jnp.where(want_any & closer, 0.0, active)
        return t_best, tri, active

    for k in range(K):
        stack_ref[k, 0] = 1

    def body(i, c):
        t_bs, tris_, acts = c
        t_n = list(t_bs); tri_n = list(tris_); act_n = list(acts)
        for k in range(K):
            if variant == "noscalar":
                r = (i * (k + 3)) % n_rows
                cnt = (r & 3)
                col = fetch(r)
            else:
                sp = jnp.maximum(stack_ref[k, 0] % stack_size, 0)
                e = stack_ref[k, sp]
                bits_e = e & 255
                lsb = bits_e & (-bits_e)
                j = (jnp.where((lsb & 0xAA) != 0, 1, 0)
                     + jnp.where((lsb & 0xCC) != 0, 2, 0)
                     + jnp.where((lsb & 0xF0) != 0, 4, 0))
                rest = e - lsb
                stack_ref[k, sp] = jnp.where(rest == 0, e | 1, rest)
                r = jnp.clip((e >> 8) + j + i, 0, n_rows - 1)
                m = meta_ref[r]
                cnt = m & 15
                col = fetch(r)

            if variant == "noint":
                bits = jnp.int32(3)
            else:
                bits = internal_step(k, col, t_bs[k], acts[k])
            if variant == "nobits":
                bits = jnp.int32(3)
            if variant != "noscalar":
                slot = jnp.clip(sp + 1, 0, stack_size - 1)
                stack_ref[k, slot] = jnp.where(
                    bits != 0, ((m >> 4) << 8) | bits, stack_ref[k, slot])

            if variant == "noleaf":
                t_n[k] = t_bs[k] + 0.0
            else:
                tb, tr, ac = leaf_step(k, col, cnt, t_bs[k], tris_[k],
                                       acts[k], jnp.int32(1) > 0)
                t_n[k] = tb; tri_n[k] = tr; act_n[k] = ac
        return (tuple(t_n), tuple(tri_n), tuple(act_n))

    init = (tuple(jnp.full((1, P), 1e30, jnp.float32) for _ in range(K)),
            tuple(jnp.full((1, P), -1.0, jnp.float32) for _ in range(K)),
            tuple(jnp.ones((1, P), jnp.float32) for _ in range(K)))
    t_bs, tris_, _ = jax.lax.fori_loop(0, STEPS, body, init)
    for k in range(K):
        out_ref[k] = jnp.concatenate(
            [t_bs[k], tris_[k],
             jnp.zeros((6, P), jnp.float32)], axis=0)


def main():
    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    scene, cam, film, n_tri = B.build_bench_scene(n_tris)
    tris = scene.triangles
    B.log(f"scene ready; K={K} STEPS={STEPS}")
    G = 64  # grid steps
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.standard_normal((G * K, 16, P)).astype(np.float32))
    ss = int(tris.stack_depth) + 8

    for variant in ("full", "noroll", "noleaf", "noint", "nobits",
                    "noscalar"):
        kk = functools.partial(kern, variant=variant,
                               n_rows=int(tris.meta.shape[0]), stack_size=ss)
        f = jax.jit(lambda r, kk=kk: pl.pallas_call(
            kk,
            out_shape=jax.ShapeDtypeStruct((G * K, 8, P), jnp.float32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((K, 16, P), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((K, 8, P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((K, ss), jnp.int32),
                pltpu.VMEM(tris.tiles8.shape, jnp.float32),
                pltpu.SMEM(tris.meta.shape, jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(tris.meta, r, tris.tiles8))
        out = f(rays); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = f(rays)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        ns = dt / (G * STEPS * K) * 1e9
        B.log(f"{variant:9s}: {dt*1e3:7.2f} ms  {ns:7.1f} ns/packet-step")


if __name__ == "__main__":
    main()
