"""Round 2 of gather measurements.

F. pallas take_along_axis axis=0 (tpu.dynamic_gather sublane form):
   correctness for full-range indices + speed vs table rows R.
G. same, axis=1 (lane form) on the transposed layout.
H. XLA jnp.take with narrow rows (W=16/32/64) at large lane counts —
   simulates a quantized/compressed BVH node row.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def honest(f, make_args, reps=3, warmup=1):
    for r in range(warmup):
        out = f(*make_args(1000 + r))
    jax.block_until_ready(out)
    chk = 0.0
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*make_args(r))
        chk += float(jnp.asarray(out).ravel()[0])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, chk


# --------------------------- F: pallas take_along_axis axis=0 (sublanes)
def check_and_bench_taa0(R, W=128, K=32):
    rng = np.random.default_rng(0)
    tab_np = rng.standard_normal((R, W)).astype(np.float32)
    tab_np[:, 0] = rng.integers(0, R, R).astype(np.float32)
    tab = jnp.asarray(tab_np)
    idx_np = rng.integers(0, R, R).astype(np.int32)
    idx = jnp.asarray(idx_np)

    # correctness first: single gather
    def kernel1(idx_ref, tab_ref, out_ref):
        i2 = jnp.broadcast_to(idx_ref[:][:, None], (R, W))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], i2, axis=0)

    @jax.jit
    def g1(idx, tab):
        return pl.pallas_call(
            kernel1,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)

    try:
        got = np.asarray(g1(idx, tab))
    except Exception as e:
        print(f"  F taa0 R={R}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    want = tab_np[idx_np]
    ok = np.allclose(got, want)
    print(f"  F taa0 R={R} W={W}: correct={ok}", flush=True)
    if not ok:
        bad = np.where(~np.isclose(got, want).all(axis=1))[0]
        print(f"    first bad rows {bad[:4]} idx {idx_np[bad[:4]]}")
        return

    # dependent chase speed
    def kernel(idx_ref, tab_ref, out_ref):
        tab = tab_ref[:]

        def body(k, c):
            idx, acc = c
            i2 = jnp.broadcast_to(idx[:, None], (R, W))
            rows = jnp.take_along_axis(tab, i2, axis=0)
            acc = acc + rows[:, 1:9].sum(-1)
            idx = rows[:, 0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx_ref[:], jnp.zeros(R)))
        out_ref[:] = acc

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab).sum()

    dt, chk = honest(f, lambda r: ((idx + r) % R, tab))
    print(
        f"    chase: {dt/K*1e6:9.2f} us/step ({dt/K/R*1e9:7.2f} ns/lane) "
        f"chk={chk:.1f}",
        flush=True,
    )


# --------------------------- G: lane-dim gather on transposed table
def check_and_bench_taa1(R, W=128, K=32):
    # table stored transposed: (W, R); gather lanes dim. R must be <= ???
    rng = np.random.default_rng(0)
    tabT_np = rng.standard_normal((W, R)).astype(np.float32)
    tabT = jnp.asarray(tabT_np)
    idx_np = rng.integers(0, R, R).astype(np.int32)
    idx = jnp.asarray(idx_np)

    def kernel1(idx_ref, tab_ref, out_ref):
        i2 = jnp.broadcast_to(idx_ref[:][None, :], (W, R))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], i2, axis=1)

    @jax.jit
    def g1(idx, tab):
        return pl.pallas_call(
            kernel1,
            out_shape=jax.ShapeDtypeStruct((W, R), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)

    try:
        got = np.asarray(g1(idx, tabT))
    except Exception as e:
        print(f"  G taa1 R={R}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    want = tabT_np[:, idx_np]
    ok = np.allclose(got, want)
    print(f"  G taa1 R={R} W={W}: correct={ok}", flush=True)


# --------------------------- H: XLA take, narrow rows
def bench_xla_take_narrow(R, W, N, K=32):
    rng = np.random.default_rng(0)
    tab_np = rng.standard_normal((R, W)).astype(np.float32)
    tab_np[:, 0] = rng.integers(0, R, R).astype(np.float32)
    tab = jnp.asarray(tab_np)
    idxs = jnp.asarray(rng.integers(0, R, N).astype(np.int32))

    def f(tab, idx0):
        def body(k, c):
            idx, acc = c
            row = jnp.take(tab, idx, axis=0)
            acc = acc + row[:, 1 : min(9, W)].sum(-1)
            idx = row[:, 0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx0, jnp.zeros(N)))
        return acc.sum()

    fj = jax.jit(f)
    dt, chk = honest(fj, lambda r: (tab, (idxs + r) % R))
    print(
        f"  H xla take R={R:6d} W={W:3d} N={N:7d}: {dt/K*1e6:9.1f} us/step "
        f"({dt/K/N*1e9:6.2f} ns/lane) chk={chk:.1f}",
        flush=True,
    )


def main():
    for R in (1024, 8192, 16384):
        check_and_bench_taa0(R)
    for R in (1024, 8192):
        check_and_bench_taa1(R)
    for W in (16, 32, 64, 128):
        for N in (131072, 524288):
            bench_xla_take_narrow(16384, W, N)


if __name__ == "__main__":
    main()
