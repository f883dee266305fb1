"""Definitive per-step cost: scale STEPS, single-invocation wall time."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P = 16384, 128
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


def make(steps):
    def k(nxt_ref, rays_ref, tabT_ref, out_ref):
        def body(c):
            i, r, acc = c
            acc = acc + slab(fetch_a(tabT_ref, r), rays_ref)
            return i + 1, nxt_ref[r], acc
        _, _, acc = jax.lax.while_loop(lambda c: c[0] < steps, body,
                                       (jnp.int32(0), jnp.int32(0), jnp.zeros((1, P), jnp.float32)))
        out_ref[:] = acc
    return jax.jit(pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))


prev = None
for steps in (16384, 131072, 1048576):
    f = make(steps)
    jax.block_until_ready(f(nxt, rays, tabT))   # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(nxt, rays, tabT))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    marg = "" if prev is None else f"  marginal {(t - prev[1]) / (steps - prev[0]) * 1e9:6.2f} ns/step"
    print(f"STEPS={steps:8d}: {t*1e3:9.3f} ms  ({t/steps*1e9:6.2f} ns/step){marg}")
    prev = (steps, t)

# --- memoization probe: same args vs varying args ---
f = make(1048576)
rays_list = [jnp.asarray(rng.normal(size=(8, P)).astype(np.float32)) for _ in range(8)]
jax.block_until_ready(f(nxt, rays_list[0], tabT))
t0 = time.perf_counter()
for i in range(8):
    out = f(nxt, rays_list[0], tabT)   # SAME args
jax.block_until_ready(out)
t_same = (time.perf_counter() - t0) / 8
t0 = time.perf_counter()
for i in range(8):
    out = f(nxt, rays_list[i], tabT)   # DIFFERENT args
jax.block_until_ready(out)
t_diff = (time.perf_counter() - t0) / 8
print(f"same args: {t_same*1e3:9.3f} ms   diff args: {t_diff*1e3:9.3f} ms  ({t_diff/1048576*1e9:5.2f} ns/step)")

# --- force host transfer (asarray) in timing; also verify 1M correctness-ish ---
for steps in (16384, 1048576):
    fs = make(steps)
    np.asarray(fs(nxt, rays, tabT))  # warm
    t0 = time.perf_counter()
    o1 = np.asarray(fs(nxt, rays_list[1], tabT))
    t1 = time.perf_counter() - t0
    print(f"host-timed STEPS={steps}: {t1*1e3:9.3f} ms  sum={o1.sum():.1f}")

# numpy oracle for steps=1M on rays_list[1] (vectorized chase)
o = np.asarray(rays_list[1]); tT = np.asarray(tabT); nx = np.asarray(nxt)
# precompute per-node hit counts contribution for these rays: (R, P)
tn = np.full((R, 8, P), -np.inf, np.float32); tf = np.full((R, 8, P), np.inf, np.float32)
for c, (oo, ii) in enumerate(((o[0], o[3]), (o[1], o[4]), (o[2], o[5]))):
    t0v = (tT[8*c:8*c+8, :].T[:, :, None] - oo[None, None]) * ii[None, None]
    t1v = (tT[8*(c+3):8*(c+3)+8, :].T[:, :, None] - oo[None, None]) * ii[None, None]
    tn = np.maximum(tn, np.minimum(t0v, t1v)); tf = np.minimum(tf, np.maximum(t0v, t1v))
contrib = ((tn <= tf) & (tf > 0)).astype(np.float64).sum(1)  # (R, P)
# walk the chase: visit counts per node over 1M steps
visits = np.zeros(R, np.int64)
r = 0
for i in range(1048576):
    visits[r] += 1
    r = nx[r]
acc = (visits[:, None] * contrib).sum(0)
print("oracle sum:", acc.sum(), " matches:", np.allclose(o1.astype(np.float64).sum(), acc.sum(), rtol=1e-3))
