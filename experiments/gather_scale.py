"""How does dependent-row-gather cost scale with lane count?

If the per-step cost is latency/overhead-bound (flat in N), bigger
dispatches amortize it and the wavefront should use the largest block
that fits HBM.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def honest_time(f, make_args, reps=3, warmup=1):
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
    K = 32
    B, W = 17798, 128
    table_np = rng.standard_normal((B, W), dtype=np.float32)
    table_np[:, 0] = rng.integers(0, B, B).astype(np.float32)
    table = jnp.asarray(table_np)

    for N in (65536, 131072, 262144, 524288, 1048576, 2097152):
        idx_np = rng.integers(0, B, N).astype(np.int32)
        idxs = jnp.asarray(idx_np)

        def f_g(table, idx0):
            def body(k, c):
                idx, acc = c
                row = jnp.take(table, idx, axis=0)
                acc = acc + row[:, 1:9].sum(-1)
                idx = row[:, 0].astype(jnp.int32)
                return (idx, acc)

            _, acc = jax.lax.fori_loop(0, K, body, (idx0, jnp.zeros(N)))
            return acc.sum()

        fj = jax.jit(f_g)
        dt, chk = honest_time(fj, lambda r: (table, (idxs + r) % B))
        print(
            f"  N={N:8d}: {dt/K*1e6:9.1f} us/step "
            f"({dt/K/N*1e9:6.2f} ns/lane, {N*512/(dt/K)/1e9:6.1f} GB/s) chk={chk:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
