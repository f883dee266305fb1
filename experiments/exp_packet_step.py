"""Probe the core packet-traversal step primitives in Pallas on TPU:

  1. dynamic lane-slice fetch of one node column from a transposed
     (128, R) VMEM table,
  2. sublane slice + lane broadcast to (8, 128) tiles,
  3. scalar-carried while loop with SMEM stack side effects,
  4. data-dependent next-node (pointer-chase) to prevent pipelining lies.

Reports ns per traversal step for a packet of 128 rays.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16384
STEPS = 512          # chase length
P = 128              # rays per packet


def bench(f, *args, iters=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
tabT = jnp.asarray(rng.normal(size=(128, R)).astype(np.float32))
# next-pointer chain in SMEM meta
nxt = jnp.asarray(rng.integers(0, R, size=(R,), dtype=np.int32))
rays = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))


def step_kernel(nxt_ref, rays_ref, tabT_ref, out_ref, stack_ref):
    ox = rays_ref[0:1, :]
    ix = rays_ref[3:4, :]
    oy = rays_ref[1:2, :]
    iy = rays_ref[4:5, :]
    oz = rays_ref[2:3, :]
    iz = rays_ref[5:6, :]

    def body(c):
        i, r, acc = c
        col = tabT_ref[:, pl.ds(r, 1)]          # (128, 1) fetch
        lox = jnp.broadcast_to(col[0:8], (8, P))
        loy = jnp.broadcast_to(col[8:16], (8, P))
        loz = jnp.broadcast_to(col[16:24], (8, P))
        hix = jnp.broadcast_to(col[24:32], (8, P))
        hiy = jnp.broadcast_to(col[32:40], (8, P))
        hiz = jnp.broadcast_to(col[40:48], (8, P))
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit = (tn <= tf) & (tf > 0.0)           # (8, P)
        acc = acc + jnp.sum(hit.astype(jnp.float32), axis=0, keepdims=True)
        # scalar chase: next row from SMEM + a stack side effect
        stack_ref[i % 64] = r
        r2 = nxt_ref[r]
        return i + 1, r2, acc

    def cond(c):
        return c[0] < STEPS

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.zeros((1, P), jnp.float32))
    )
    out_ref[:] = acc


f = jax.jit(pl.pallas_call(
    step_kernel,
    out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
))

try:
    out = f(nxt, rays, tabT)
    # numpy oracle
    o = np.asarray(rays)
    t = np.asarray(tabT)
    r = 0
    acc = np.zeros(P, np.float32)
    for i in range(STEPS):
        col = t[:, r]
        tn = np.full((8, P), -np.inf, np.float32)
        tf = np.full((8, P), np.inf, np.float32)
        for (lo_s, hi_s, oo, ii) in ((0, 24, o[0], o[3]), (8, 32, o[1], o[4]), (16, 40, o[2], o[5])):
            t0 = (col[lo_s:lo_s+8, None] - oo[None, :]) * ii[None, :]
            t1 = (col[hi_s:hi_s+8, None] - oo[None, :]) * ii[None, :]
            tn = np.maximum(tn, np.minimum(t0, t1))
            tf = np.minimum(tf, np.maximum(t0, t1))
        acc += ((tn <= tf) & (tf > 0)).astype(np.float32).sum(0)
        r = int(np.asarray(nxt)[r])
    ok = np.allclose(np.asarray(out)[0], acc)
    print("correct:", ok)
    tm = bench(f, nxt, rays, tabT)
    print(f"step loop: {tm*1e6:8.1f} us total, {tm/STEPS*1e9:7.1f} ns/step "
          f"({tm/STEPS/P*1e9*1000:6.1f} ps/ray-step)")
except Exception as e:
    import traceback
    traceback.print_exc()
