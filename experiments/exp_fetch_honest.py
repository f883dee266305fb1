"""Honest (host-transfer-forced) per-step costs for packet-traversal
fetch variants.  block_until_ready does NOT block on the axon tunnel —
every timing must force a device->host transfer, and per-step costs are
computed as a marginal between two step counts to cancel RPC overhead
(~25 ms per transfer).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P = 16384, 128
S_LO, S_HI = 16384, 262144

rng = np.random.default_rng(0)
tab_rows = rng.normal(size=(R, 128)).astype(np.float32)
tabT = jnp.asarray(np.ascontiguousarray(tab_rows.T))
tab = jnp.asarray(tab_rows)
nxt = jnp.asarray(rng.integers(0, R, size=(R,), dtype=np.int32))
rays = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))


def htime(f, *args, reps=3):
    np.asarray(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


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


def fetch_b(tab_ref, r):
    row = tab_ref[pl.ds(r, 1), :]
    b = jnp.broadcast_to(row, (128, 128))
    eye = jnp.eye(128, dtype=jnp.float32)
    col = jax.lax.dot_general(eye, b, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return lambda j: col[8 * j : 8 * j + 8, :P]


def fetch_c(tab_ref, r):
    row = tab_ref[pl.ds(r, 1), :]
    b = jnp.broadcast_to(row, (8, 128))
    colT = jnp.transpose(b, (1, 0))
    col = colT[:, 0:1]
    return lambda j: jnp.broadcast_to(col[8 * j : 8 * j + 8], (8, P))


def fetch_d(tab_ref, r):
    def cols8(j):
        vals = [tab_ref[r, 8 * j + k] for k in range(8)]
        col = jnp.stack(vals).reshape(8, 1)
        return jnp.broadcast_to(col, (8, P))
    return cols8


def make(fetch, steps, empty=False):
    def k(nxt_ref, rays_ref, tab_ref, out_ref):
        def body(c):
            i, r, acc = c
            if not empty:
                acc = acc + slab(fetch(tab_ref, r), rays_ref)
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


for name, fetch, table in (("empty   ", None, tab),
                           ("A roll  ", fetch_a, tabT),
                           ("B mxu   ", fetch_b, tab),
                           ("C xpose ", fetch_c, tab),
                           ("D scalar", fetch_d, tab)):
    try:
        empty = fetch is None
        f_lo = make(fetch, S_LO, empty)
        f_hi = make(fetch, S_HI, empty)
        t_lo = htime(f_lo, nxt, rays, table)
        t_hi = htime(f_hi, nxt, rays, table)
        marg = (t_hi - t_lo) / (S_HI - S_LO)
        print(f"{name}: {marg*1e9:7.1f} ns/step   (lo {t_lo*1e3:7.2f} ms, hi {t_hi*1e3:7.2f} ms)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")
