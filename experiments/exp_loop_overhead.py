"""Isolate per-iteration overhead of scalar-carried loops in Mosaic:
  1. empty while_loop (scalar carry only)
  2. while_loop + SMEM scalar chase
  3. while_loop + vector acc only
  4. fori_loop + vector acc
  5. fori_loop + fetch A (aligned block + roll) + slab, static index
  6. while_loop + fetch A + slab, SMEM chase (same as exp2 A)
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, STEPS, P = 16384, 16384, 128


def bench(f, *args, iters=50):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
tabT = jnp.asarray(rng.normal(size=(128, R)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, R, size=(R,), dtype=np.int32))
rays = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))


def slab(cols8, rays_ref):
    ox, oy, oz = rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :]
    ix, iy, iz = rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :]
    t0x = (cols8(0) - ox) * ix
    t1x = (cols8(3) - ox) * ix
    t0y = (cols8(1) - oy) * iy
    t1y = (cols8(4) - oy) * iy
    t0z = (cols8(2) - oz) * iz
    t1z = (cols8(5) - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
    hit = (tn <= tf) & (tf > 0.0)
    return jnp.sum(hit.astype(jnp.float32), axis=0, keepdims=True)


def fetch_a(tabT_ref, r):
    blk = tabT_ref[:, pl.ds((r // 128) * 128, 128)]
    col = pltpu.roll(blk, -(r % 128), axis=1)[:, 0:1]
    return lambda j: jnp.broadcast_to(col[8 * j : 8 * j + 8], (8, P))


def make(kernel):
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))


def k1(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(c):
        i, s = c
        return i + 1, s + i
    i, s = jax.lax.while_loop(lambda c: c[0] < STEPS, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[:] = jnp.full((1, P), s, jnp.float32)


def k2(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(c):
        i, r = c
        return i + 1, nxt_ref[r]
    i, r = jax.lax.while_loop(lambda c: c[0] < STEPS, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[:] = jnp.full((1, P), r, jnp.float32)


def k3(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(c):
        i, acc = c
        return i + 1, acc + rays_ref[0:1, :]
    i, acc = jax.lax.while_loop(lambda c: c[0] < STEPS, body, (jnp.int32(0), jnp.zeros((1, P), jnp.float32)))
    out_ref[:] = acc


def k4(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(i, acc):
        return acc + rays_ref[0:1, :] * i
    acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((1, P), jnp.float32))
    out_ref[:] = acc


def k5(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(i, acc):
        r = (i * 37) % R
        return acc + slab(fetch_a(tabT_ref, r), rays_ref)
    acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((1, P), jnp.float32))
    out_ref[:] = acc


def k6(nxt_ref, rays_ref, tabT_ref, out_ref):
    def body(c):
        i, r, acc = c
        acc = acc + slab(fetch_a(tabT_ref, r), rays_ref)
        return i + 1, nxt_ref[r], acc
    _, _, acc = jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                                   (jnp.int32(0), jnp.int32(0), jnp.zeros((1, P), jnp.float32)))
    out_ref[:] = acc


for name, k in (("empty while     ", k1), ("smem chase while", k2),
                ("vec acc while   ", k3), ("vec acc fori    ", k4),
                ("fetch+slab fori ", k5), ("fetch+slab while", k6)):
    try:
        f = make(k)
        f(nxt, rays, tabT)
        t = bench(f, nxt, rays, tabT)
        print(f"{name}: {t/STEPS*1e9:8.1f} ns/step  ({t*1e6:7.1f} us total)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")

# --- correctness check of k6 at large STEPS ---
f6 = make(k6)
out = np.asarray(f6(nxt, rays, tabT))[0]
o = np.asarray(rays)
tT = np.asarray(tabT)
nx = np.asarray(nxt)
r = 0
acc = np.zeros(P, np.float32)
for i in range(STEPS):
    col = tT[:, r]
    tn = np.full((8, P), -np.inf, np.float32)
    tf = np.full((8, P), np.inf, np.float32)
    for c, (oo, ii) in enumerate(((o[0], o[3]), (o[1], o[4]), (o[2], o[5]))):
        t0 = (col[8*c:8*c+8, None] - oo[None]) * ii[None]
        t1 = (col[8*(c+3):8*(c+3)+8, None] - oo[None]) * ii[None]
        tn = np.maximum(tn, np.minimum(t0, t1))
        tf = np.minimum(tf, np.maximum(t0, t1))
    acc += ((tn <= tf) & (tf > 0)).astype(np.float32).sum(0)
    r = int(nx[r])
print("k6 @ 16384 correct:", np.allclose(out, acc), "max|d|:", np.abs(out-acc).max())
