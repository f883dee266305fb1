"""Compare node-fetch strategies for packet traversal (see exp_packet_step).

Goal: get node r's 48 box floats into six (8,128) lane-broadcast tiles.
  A. transposed table (128, R): load aligned (128,128) block, dynamic
     lane roll by r%128, static col 0 slice, sublane slices + broadcasts.
  B. row table (R, 128): load (1,128) row, broadcast to (128,128),
     MXU transpose trick (dot with identity, contracting lane dims).
  C. row table: load (1,128) row, broadcast (8,128), jnp.transpose
     to (128,8), col 0.
  D. row table: 48 scalar reads + fills.
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16384
STEPS = 512
P = 128


def bench(f, *args, iters=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
tab_rows = rng.normal(size=(R, 128)).astype(np.float32)
tabT = jnp.asarray(np.ascontiguousarray(tab_rows.T))   # (128, R)
tab = jnp.asarray(tab_rows)
nxt = jnp.asarray(rng.integers(0, R, size=(R,), dtype=np.int32))
rays = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))


def slab(cols8, rays_ref):
    """cols8: function j -> (8,P) broadcast tile of sublanes 8j:8j+8."""
    ox, oy, oz = rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :]
    ix, iy, iz = rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :]
    t0x = (cols8(0) - ox) * ix
    t1x = (cols8(3) - ox) * ix
    t0y = (cols8(1) - oy) * iy
    t1y = (cols8(4) - oy) * iy
    t0z = (cols8(2) - oz) * iz
    t1z = (cols8(5) - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    hit = (tn <= tf) & (tf > 0.0)
    return jnp.sum(hit.astype(jnp.float32), axis=0, keepdims=True)


def make(kernel, table):
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    return functools.partial(f, nxt, rays, table)


def loop(fetch_cols8):
    def kernel(nxt_ref, rays_ref, tab_ref, out_ref):
        def body(c):
            i, r, acc = c
            cols8 = fetch_cols8(tab_ref, r)
            acc = acc + slab(cols8, rays_ref)
            return i + 1, nxt_ref[r], acc
        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < STEPS,
            body,
            (jnp.int32(0), jnp.int32(0), jnp.zeros((1, P), jnp.float32)),
        )
        out_ref[:] = acc
    return kernel


# --- A: transposed table, aligned block + dynamic roll ---
def fetch_a(tabT_ref, r):
    blk = tabT_ref[:, pl.ds((r // 128) * 128, 128)]    # (128,128)
    col = pltpu.roll(blk, -(r % 128), axis=1)[:, 0:1]  # (128,1)
    return lambda j: jnp.broadcast_to(col[8 * j : 8 * j + 8], (8, P))


# --- B: row table, MXU transpose trick ---
def fetch_b(tab_ref, r):
    row = tab_ref[pl.ds(r, 1), :]                      # (1,128)
    b = jnp.broadcast_to(row, (128, 128))
    eye = jnp.eye(128, dtype=jnp.float32)
    # out[i,l] = sum_k eye[i,k] * b[l,k] = b[l,i] = row[i]
    col = jax.lax.dot_general(
        eye, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return lambda j: col[8 * j : 8 * j + 8, :P]


# --- C: row table, relayout transpose ---
def fetch_c(tab_ref, r):
    row = tab_ref[pl.ds(r, 1), :]
    b = jnp.broadcast_to(row, (8, 128))
    colT = jnp.transpose(b, (1, 0))                    # (128, 8)
    col = colT[:, 0:1]
    return lambda j: jnp.broadcast_to(col[8 * j : 8 * j + 8], (8, P))


# --- D: scalar reads ---
def fetch_d(tab_ref, r):
    def cols8(j):
        vals = [tab_ref[r, 8 * j + k] for k in range(8)]
        col = jnp.stack(vals).reshape(8, 1)
        return jnp.broadcast_to(col, (8, P))
    return cols8


# numpy oracle
def oracle():
    o = np.asarray(rays)
    r = 0
    acc = np.zeros(P, np.float32)
    for i in range(STEPS):
        row = tab_rows[r]
        tn = np.full((8, P), -np.inf, np.float32)
        tf = np.full((8, P), np.inf, np.float32)
        for c, (oo, ii) in enumerate(((o[0], o[3]), (o[1], o[4]), (o[2], o[5]))):
            t0 = (row[8 * c : 8 * c + 8, None] - oo[None, :]) * ii[None, :]
            t1 = (row[8 * (c + 3) : 8 * (c + 3) + 8, None] - oo[None, :]) * ii[None, :]
            tn = np.maximum(tn, np.minimum(t0, t1))
            tf = np.minimum(tf, np.maximum(t0, t1))
        acc += ((tn <= tf) & (tf > 0)).astype(np.float32).sum(0)
        r = int(np.asarray(nxt)[r])
    return acc


ref = oracle()
for name, fetch, table in (
    ("A roll  ", fetch_a, tabT),
    ("B mxu   ", fetch_b, tab),
    ("C xpose ", fetch_c, tab),
    ("D scalar", fetch_d, tab),
):
    try:
        f = make(loop(fetch), table)
        out = np.asarray(f())[0]
        ok = np.allclose(out, ref)
        t = bench(f)
        print(f"{name}: correct={ok}  {t/STEPS*1e9:7.1f} ns/step")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
