"""Micro-benchmark: per-lane row gather from a VMEM-resident table inside
a Pallas kernel vs the XLA HBM gather that dominates round-2's traversal.

The traversal's hot op is rows[idx] with idx (N,) int32 per-lane divergent
and rows (R, 128) f32.  Round 2 measured the XLA version at 0.4-1.9 ms per
step at N=131072 (HBM random access, 67 MB touched).  If Mosaic can lower
jnp.take from a VMEM-resident value, the whole traversal loop can live in
one kernel with zero HBM traffic for the table.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16384          # rows in table (9.1 MB like the bench scene is 17798)
W = 128
N = 131072         # lanes
B = 2048           # lanes per grid step


def bench(f, *args, iters=20):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (R, W), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R, jnp.int32)

# --- baseline: XLA gather ---
@jax.jit
def xla_gather(table, idx):
    return table[idx]

t = bench(xla_gather, table, idx)
print(f"XLA HBM gather      : {t*1e3:8.3f} ms  ({N*W*4/t/1e9:7.1f} GB/s)")


# --- pallas: whole table in VMEM, jnp.take per block ---
def take_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


def make_take(B):
    grid = (N // B,)
    return jax.jit(pl.pallas_call(
        take_kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    ))


for b in (1024, 2048, 8192):
    try:
        f = make_take(b)
        t = bench(f, idx, table)
        print(f"pallas take B={b:5d} : {t*1e3:8.3f} ms  ({N*W*4/t/1e9:7.1f} GB/s)")
    except Exception as e:
        print(f"pallas take B={b}: FAIL {type(e).__name__}: {str(e)[:300]}")


# --- pallas: scalar-loop gather (one dynamic slice per lane) ---
def scalar_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


def make_scalar(B):
    grid = (N // B,)
    return jax.jit(pl.pallas_call(
        scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    ))


try:
    f = make_scalar(2048)
    t = bench(f, idx, table, iters=5)
    print(f"pallas scalar loop  : {t*1e3:8.3f} ms  ({N*W*4/t/1e9:7.1f} GB/s)")
except Exception as e:
    print(f"pallas scalar: FAIL {type(e).__name__}: {str(e)[:300]}")
