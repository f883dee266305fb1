"""Which row-gather primitive should the Pallas traversal kernel use?

The BVH traversal step is: per-lane node index -> fetch (128,) f32 row ->
VPU tile math -> next index.  In plain XLA the dependent `jnp.take` costs
0.4-1.9 ms/step at 131k lanes (round-2 honest_bench).  This experiment
measures candidate in-kernel strategies on the real chip:

  A. XLA jnp.take baseline (outside pallas) at several lane counts
  B. pallas: jnp.take of a VMEM-resident table (does Mosaic lower it? speed?)
  C. pallas: one-hot matmul gather (MXU) for small tables
  D. pallas: per-lane async DMA from HBM (pipelined, K in flight)
  E. pallas: scalar dynamic-slice row fetch rate (packet-traversal primitive)

Every timing is "honest": args perturbed per rep, result folded into a
checksum (axon result-cache workaround, see honest_bench.py).
"""
from __future__ import annotations

import functools
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


def report(name, dt, steps, lanes, chk):
    print(
        f"  {name:44s}: {dt/steps*1e6:9.2f} us/step "
        f"({dt/steps/lanes*1e9:7.2f} ns/lane) chk={chk:.1f}",
        flush=True,
    )


# ---------------------------------------------------------------- A: XLA take
def bench_xla_take(table, idxs, K=32):
    R = table.shape[0]
    N = idxs.shape[0]

    def f(table, idx0):
        def body(k, c):
            idx, acc = c
            row = jnp.take(table, idx, axis=0)
            acc = acc + row[:, 1:9].sum(-1)
            idx = row[:, 0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx0, jnp.zeros(N)))
        return acc.sum()

    fj = jax.jit(f)
    dt, chk = honest(fj, lambda r: (table, (idxs + r) % R))
    report(f"A xla take       R={R} N={N}", dt, K, N, chk)


# ------------------------------------------------- B: pallas VMEM jnp.take
def bench_pallas_vmem_take(table, idxs, K=32):
    R, W = table.shape
    N = idxs.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        tab = tab_ref[:]

        def body(k, c):
            idx, acc = c
            row = jnp.take(tab, idx, axis=0)
            acc = acc + row[:, 1:9].sum(-1)
            idx = row[:, 0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx_ref[:], jnp.zeros(N)))
        out_ref[:] = acc

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab).sum()

    dt, chk = honest(f, lambda r: ((idxs + r) % R, table))
    report(f"B pallas vmem take R={R} N={N}", dt, K, N, chk)


# -------------------------------------- B2: pallas per-column 1D take (lanes)
def bench_pallas_vmem_take_cols(table, idxs, K=32, ncols=9):
    R, W = table.shape
    N = idxs.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        def body(k, c):
            idx, acc = c
            cols = []
            for j in range(ncols):
                cols.append(jnp.take(tab_ref[:, j], idx, axis=0))
            acc = acc + sum(cols[1:])
            idx = cols[0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx_ref[:], jnp.zeros(N)))
        out_ref[:] = acc

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab).sum()

    dt, chk = honest(f, lambda r: ((idxs + r) % R, table))
    report(f"B2 pallas col-takes x{ncols} R={R} N={N}", dt, K, N, chk)


# ---------------------------------------------------- C: one-hot MXU gather
def bench_pallas_onehot(table, idxs, K=8):
    R, W = table.shape
    N = idxs.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        tab = tab_ref[:]

        def body(k, c):
            idx, acc = c
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (N, R), 1)
                == idx[:, None]
            ).astype(jnp.bfloat16)
            row = jnp.dot(
                oh, tab.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc = acc + row[:, 1:9].sum(-1)
            idx = row[:, 0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (idx_ref[:], jnp.zeros(N)))
        out_ref[:] = acc

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab).sum()

    dt, chk = honest(f, lambda r: ((idxs + r) % R, table))
    report(f"C pallas one-hot  R={R} N={N}", dt, K, N, chk)


# ------------------------------------------- D: per-lane pipelined DMA (HBM)
def bench_pallas_dma(table, idxs, K=4, INFLIGHT=8):
    R, W = table.shape
    N = idxs.shape[0]

    def kernel(idx_ref, tab_ref, out_ref, rowbuf, sems):
        # one "step": fetch N rows by per-lane DMA, pipelined
        def fetch_all(step, acc):
            def start(i):
                pltpu.make_async_copy(
                    tab_ref.at[idx_ref[i]], rowbuf.at[i % INFLIGHT],
                    sems.at[i % INFLIGHT],
                ).start()

            def body(i, acc):
                @pl.when(i + INFLIGHT < N)
                def _():
                    start(i + INFLIGHT)

                pltpu.make_async_copy(
                    tab_ref.at[idx_ref[i]], rowbuf.at[i % INFLIGHT],
                    sems.at[i % INFLIGHT],
                ).wait()
                return acc + rowbuf[i % INFLIGHT, 1]

            for i in range(INFLIGHT):
                start(i)
            return jax.lax.fori_loop(0, N, body, acc)

        out_ref[0, 0] = jax.lax.fori_loop(0, K, fetch_all, 0.0)

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((INFLIGHT, W), jnp.float32),
                pltpu.SemaphoreType.DMA((INFLIGHT,)),
            ],
        )(idx, tab)[0, 0]

    dt, chk = honest(f, lambda r: ((idxs + r) % R, table))
    report(f"D pallas lane-DMA R={R} N={N}", dt, K, N, chk)


# --------------------------------- E: scalar dynamic-slice row fetch (packet)
def bench_pallas_scalar_rows(table, K=4096):
    R, W = table.shape

    def kernel(tab_ref, out_ref):
        def body(k, c):
            idx, acc = c
            row = tab_ref[idx]  # scalar dynamic index -> (W,) row
            acc = acc + row[1:9].sum()
            idx = row[0].astype(jnp.int32)
            return (idx, acc)

        _, acc = jax.lax.fori_loop(0, K, body, (jnp.int32(0), 0.0))
        out_ref[0, 0] = acc

    @jax.jit
    def f(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab)[0, 0]

    dt, chk = honest(f, lambda r: (table + (r * 0.0),), reps=2)
    print(
        f"  E scalar row chase R={R}: {dt/K*1e9:9.1f} ns/row-fetch chk={chk:.1f}",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    for R in (2048, 16384):
        W = 128
        table_np = rng.standard_normal((R, W)).astype(np.float32)
        table_np[:, 0] = rng.integers(0, R, R).astype(np.float32)
        table = jnp.asarray(table_np)

        for N in (8192, 131072):
            idxs = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
            bench_xla_take(table, idxs)
            for fn, label in (
                (bench_pallas_vmem_take, "B"),
                (bench_pallas_vmem_take_cols, "B2"),
                (bench_pallas_onehot, "C"),
            ):
                try:
                    fn(table, idxs)
                except Exception as e:
                    print(f"  {label} FAILED: {type(e).__name__}: {str(e)[:200]}")
            if N <= 8192:
                try:
                    bench_pallas_dma(table, idxs)
                except Exception as e:
                    print(f"  D FAILED: {type(e).__name__}: {str(e)[:200]}")
        try:
            bench_pallas_scalar_rows(table)
        except Exception as e:
            print(f"  E FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
