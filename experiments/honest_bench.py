"""Honest TPU micro-timing: defeats the axon result-cache anomaly.

Methodology discovered in round 2: repeated jit calls with IDENTICAL
arguments can return ~instantly with correct values (some layer caches
results), so every rep here perturbs one argument and the result is
folded into a running checksum that is printed at the end.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def honest_time(f, make_args, reps=3, warmup=1):
    """f: jitted fn; make_args(rep) -> tuple of args (vary per rep!)."""
    for r in range(warmup):
        out = f(*make_args(1000 + r))
    jax.block_until_ready(out)
    chk = 0.0
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*make_args(r))
        chk += float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    return dt, chk


def main():
    rng = np.random.default_rng(0)
    K = 64

    print("== sin fori loop (baseline loop overhead) ==")
    N = 131072
    xs = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    def f_sin(x):
        def body(k, x):
            return jnp.sin(x * 0.999 + 0.001)
        return jax.lax.fori_loop(0, 256, body, x).sum()

    dt, chk = honest_time(jax.jit(f_sin), lambda r: (xs + r,))
    print(f"  sin fori 256 steps N={N}: {dt/256*1e6:7.2f} us/step (chk {chk:.1f})")

    print("== dependent row-gather loop: us/step ==")
    for B, W in ((4096, 32), (16384, 32), (16384, 128), (131072, 32), (131072, 128)):
        table_np = rng.standard_normal((B, W), dtype=np.float32)
        table_np[:, 0] = rng.integers(0, B, B).astype(np.float32)
        table = jnp.asarray(table_np)
        for N in (8192, 32768, 131072):
            idx_np = rng.integers(0, B, N).astype(np.int32)
            idxs = jnp.asarray(idx_np)

            def f_g(table, idx0):
                def body(k, c):
                    idx, acc = c
                    row = jnp.take(table, idx, axis=0)
                    acc = acc + row[:, 1:9].sum(-1)
                    idx = row[:, 0].astype(jnp.int32)
                    return (idx, acc)
                _, acc = jax.lax.fori_loop(0, K, body, (idxs * 0 + idx0, jnp.zeros(N)))
                return acc.sum()

            fj = jax.jit(f_g)
            dt, chk = honest_time(fj, lambda r: (table, (idxs + r) % B))
            print(
                f"  B={B:6d} W={W:3d} N={N:6d}: {dt/K*1e6:8.1f} us/step "
                f"({dt/K/N*1e9:6.2f} ns/lane)  chk={chk:.1f}"
            )


if __name__ == "__main__":
    main()
