"""Microbenchmarks for TPU primitive costs that drive the tracer design.

Run on the real TPU:  python experiments/micro_tpu.py

Measures (all f32 unless noted):
  1. row gather: out[i] = table[idx[i]]  via jnp.take         (XLA gather)
  2. sort with payload columns (jax.lax.sort)                 (compaction cost)
  3. dense ray x tri intersection tiles (pure VPU jnp)        (brute-force unit)
  4. matmul throughput f32 / bf16                             (MXU ceiling)
  5. argsort+take permutation of wide rows                    (wavefront shuffle)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_gather():
    print("== row gather out[i] = table[idx[i]] : (N rows from (B,W) table) ==")
    key = jax.random.PRNGKey(0)
    for B in (4096, 65536, 524288):
        for W in (8, 16, 64):
            table = jax.random.normal(key, (B, W), jnp.float32)
            for N in (32768, 131072, 524288):
                idx = jax.random.randint(key, (N,), 0, B, jnp.int32)

                f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
                dt = timeit(f, table, idx)
                gbps = N * W * 4 / dt / 1e9
                print(
                    f"  B={B:7d} W={W:3d} N={N:7d}: {dt*1e6:9.1f} us"
                    f"  ({gbps:7.2f} GB/s eff)"
                )


def bench_gather_1d():
    print("== scalar gather out[i] = table1d[idx[i]] ==")
    key = jax.random.PRNGKey(0)
    for B in (4096, 524288):
        table = jax.random.normal(key, (B,), jnp.float32)
        for N in (131072,):
            idx = jax.random.randint(key, (N,), 0, B, jnp.int32)
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            dt = timeit(f, table, idx)
            print(f"  B={B:7d} N={N:7d}: {dt*1e6:9.1f} us")


def bench_sort():
    print("== lax.sort_key_val (int32 key, multiple f32 payload cols) ==")
    key = jax.random.PRNGKey(1)
    for N in (131072, 524288):
        for P in (1, 4, 16):
            keys = jax.random.randint(key, (N,), 0, 1 << 20, jnp.int32)
            payload = jax.random.normal(key, (N, P), jnp.float32)

            def f(k, v):
                # sort rows of v by k: sort key with a permutation payload
                order = jnp.argsort(k)
                return jnp.take(v, order, axis=0)

            dt = timeit(jax.jit(f), keys, payload)
            print(f"  N={N:7d} payload={P:3d} cols: {dt*1e6:9.1f} us")


def bench_argsort_only():
    print("== argsort of int32 keys ==")
    key = jax.random.PRNGKey(1)
    for N in (131072, 524288, 2097152):
        keys = jax.random.randint(key, (N,), 0, 1 << 20, jnp.int32)
        dt = timeit(jax.jit(jnp.argsort), keys)
        print(f"  N={N:7d}: {dt*1e6:9.1f} us")


def bench_cumsum():
    print("== cumsum int32 (compaction prefix sums) ==")
    key = jax.random.PRNGKey(1)
    for N in (131072, 2097152):
        x = jax.random.randint(key, (N,), 0, 2, jnp.int32)
        dt = timeit(jax.jit(jnp.cumsum), x)
        print(f"  N={N:7d}: {dt*1e6:9.1f} us")


def bench_dense_intersect():
    print("== dense tile intersect: (T_rays x T_tris) Moller-Trumbore, VPU ==")
    key = jax.random.PRNGKey(2)

    def make(nr, nt, nb):
        o = jax.random.normal(key, (nb, nr, 3), jnp.float32)
        d = jax.random.normal(key, (nb, nr, 3), jnp.float32)
        p0 = jax.random.normal(key, (nb, nt, 3), jnp.float32)
        e1 = jax.random.normal(key, (nb, nt, 3), jnp.float32)
        e2 = jax.random.normal(key, (nb, nt, 3), jnp.float32)
        return o, d, p0, e1, e2

    def intersect(o, d, p0, e1, e2):
        # batched all-pairs MT: (nb, nr, nt)
        o = o[:, :, None, :]
        d = d[:, :, None, :]
        p0 = p0[:, None, :, :]
        e1 = e1[:, None, :, :]
        e2 = e2[:, None, :, :]
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec, -1)
        inv = 1.0 / jnp.where(det == 0, 1.0, det)
        tvec = o - p0
        u = jnp.sum(tvec * pvec, -1) * inv
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec, -1) * inv
        t = jnp.sum(e2 * qvec, -1) * inv
        hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        t = jnp.where(hit, t, jnp.inf)
        # reduce to closest per ray
        tbest = jnp.min(t, axis=-1)
        ibest = jnp.argmin(t, axis=-1)
        return tbest, ibest

    for (nr, nt, nb) in ((256, 256, 512), (128, 128, 2048), (512, 512, 128)):
        args = make(nr, nt, nb)
        dt = timeit(jax.jit(intersect), *args)
        pairs = nr * nt * nb
        print(
            f"  rays={nr} tris={nt} tiles={nb}: {dt*1e6:9.1f} us"
            f"  ({pairs/dt/1e9:6.2f} Gpairs/s)"
        )


def bench_matmul():
    print("== matmul ceiling ==")
    key = jax.random.PRNGKey(3)
    for dt_ in (jnp.float32, jnp.bfloat16):
        for M, K, N in ((8192, 8192, 8192),):
            a = jax.random.normal(key, (M, K)).astype(dt_)
            b = jax.random.normal(key, (K, N)).astype(dt_)
            f = jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum())
            t = timeit(f, a, b, reps=5)
            tf = 2 * M * K * N / t / 1e12
            print(f"  {dt_.__name__}: {M}x{K}x{N}: {t*1e3:8.2f} ms  {tf:7.1f} TFLOP/s")


def bench_onehot_gather():
    print("== one-hot matmul gather (bf16 MXU): N rows from (B,W) ==")
    key = jax.random.PRNGKey(4)
    for B, W, N in ((4096, 16, 131072), (8192, 64, 131072)):
        table = jax.random.normal(key, (B, W), jnp.bfloat16)
        idx = jax.random.randint(key, (N,), 0, B, jnp.int32)

        def f(t, i):
            # tile over N to bound the one-hot
            TB = 1024
            def body(c, ii):
                oh = (ii[:, None] == jnp.arange(B)[None, :]).astype(jnp.bfloat16)
                return c, (oh @ t)
            _, out = jax.lax.scan(body, 0, i.reshape(-1, TB))
            return out

        dt = timeit(jax.jit(f), table, idx)
        gbps = N * W * 2 / dt / 1e9
        print(f"  B={B} W={W} N={N}: {dt*1e6:9.1f} us  ({gbps:6.1f} GB/s eff)")


def bench_while_gather():
    print("== while_loop of K sequential dependent gathers (traversal shape) ==")
    key = jax.random.PRNGKey(5)
    B, W = 150000, 16
    table = jax.random.normal(key, (B, W), jnp.float32)
    nxt = jax.random.randint(key, (B,), 0, B, jnp.int32)
    for N in (32768, 131072):
        idx0 = jax.random.randint(key, (N,), 0, B, jnp.int32)

        def f(table, nxt, idx0):
            def body(c):
                k, idx, acc = c
                row = jnp.take(table, idx, axis=0)
                acc = acc + row.sum(-1)
                idx = jnp.take(nxt, idx, axis=0)
                return (k + 1, idx, acc)

            def cond(c):
                return c[0] < 32

            _, _, acc = jax.lax.while_loop(cond, body, (0, idx0, jnp.zeros(N)))
            return acc

        dt = timeit(jax.jit(f), table, nxt, idx0, reps=3)
        print(f"  N={N:7d}, 32 steps (2 gathers each): {dt*1e3:9.2f} ms"
              f"  -> {dt/64*1e6:7.1f} us/gather")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    bench_matmul()
    bench_gather()
    bench_gather_1d()
    bench_while_gather()
    bench_onehot_gather()
    bench_argsort_only()
    bench_sort()
    bench_cumsum()
    bench_dense_intersect()
