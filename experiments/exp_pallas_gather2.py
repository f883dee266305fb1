"""Validate the Pallas gather variants for correctness, then re-time with
an output-reduction (so HBM write bandwidth doesn't mask the gather cost).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, N = 16384, 128, 131072


def bench(f, *args, iters=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R, jnp.int32)
ref = np.asarray(table)[np.asarray(idx)]

# --- scalar-loop gather, full output (correctness) ---
def scalar_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


def make_scalar(B):
    return jax.jit(pl.pallas_call(
        scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    ))


f = make_scalar(2048)
out = np.asarray(f(idx, table))
print("scalar-loop correct:", np.array_equal(out, ref))
t = bench(f, idx, table)
print(f"scalar-loop full-out: {t*1e3:8.3f} ms ({N*W*4/t/1e9:7.1f} GB/s)")


# --- scalar-loop gather + in-kernel reduce (isolates gather cost) ---
def scalar_reduce_kernel(idx_ref, table_ref, out_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def body(i, _):
        acc[:] += table_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def make_scalar_reduce(B):
    return jax.jit(pl.pallas_call(
        scalar_reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32)],
    ))


f2 = make_scalar_reduce(2048)
out2 = np.asarray(f2(idx, table))[0]
ref2 = ref.sum(axis=0, dtype=np.float64)
print("scalar-reduce close:", np.allclose(out2, ref2, rtol=2e-3))
t = bench(f2, idx, table)
print(f"scalar-loop reduce  : {t*1e3:8.3f} ms ({N*W*4/t/1e9:7.1f} GB/s, {t/N*1e9:.2f} ns/row)")

# --- take_along_axis formulation (Mosaic dynamic_gather?) ---
def taa_kernel(idx_ref, table_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (idx_ref.shape[0], W))
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)


def make_taa(B):
    return jax.jit(pl.pallas_call(
        taa_kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    ))


try:
    f3 = make_taa(2048)
    out3 = np.asarray(f3(idx, table))
    print("take_along_axis correct:", np.array_equal(out3, ref))
    t = bench(f3, idx, table)
    print(f"take_along_axis     : {t*1e3:8.3f} ms ({N*W*4/t/1e9:7.1f} GB/s)")
except Exception as e:
    print(f"take_along_axis: FAIL {type(e).__name__}: {str(e)[:200]}")
