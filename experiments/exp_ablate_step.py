"""Ablate the packet-traversal step cost on the real TPU.

Variants (each adds one ingredient of the real loop body):
  v0 scalar : pop/push SMEM chain only (r = meta[r] dependency)
  v1 fetch32: + exact-f32 row fetch (leaf-style 96x128 HIGHEST dot)
  v2 fetchbf: + packed hi|lo bf16 fetch + slab test, result stays vector
  v3 bits   : v2 + vector->scalar bits extraction feeding the chain
  v4 cond   : v3 + lax.cond with a leaf-ish branch
Timing: marginal between two step counts to cancel launch/RPC overhead.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P, G = 16384, 128, 64
rng = np.random.default_rng(0)
tab_f = rng.normal(size=(R, 128)).astype(np.float32)
import ml_dtypes
hi = tab_f.astype(ml_dtypes.bfloat16)
lo = (tab_f - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
tab_i = ((hi.view(np.uint16).astype(np.uint32) << 16)
         | lo.view(np.uint16).astype(np.uint32)).view(np.int32)
nxt = rng.integers(0, R, size=(R,), dtype=np.int32)



def kern(meta_ref, tab_ref, tabi_ref, out_ref, *, steps, variant):
    ox = jax.lax.broadcasted_iota(
        jnp.int32, (1, P), 1).astype(jnp.float32) * 0.01 + 0.5
    eye = jnp.eye(128, dtype=jnp.float32)
    SEL_LEAF = eye[:96]
    SEL_INT = eye[:64].astype(jnp.bfloat16)

    def fetch32(r):
        row = tab_ref[pl.ds(r, 1), :]
        b = jnp.broadcast_to(row, (P, 128))
        return jax.lax.dot_general(
            SEL_LEAF, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def fetchbf(r):
        word = tabi_ref[pl.ds(r, 1), :]
        h = jax.lax.bitcast_convert_type(
            word & jnp.int32(-65536), jnp.float32).astype(jnp.bfloat16)
        l = jax.lax.bitcast_convert_type(
            word << 16, jnp.float32).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
        return (jax.lax.dot_general(SEL_INT, jnp.broadcast_to(h, (P, 128)),
                                    dims, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(SEL_INT, jnp.broadcast_to(l, (P, 128)),
                                      dims, preferred_element_type=jnp.float32))

    def slab(col, acc):
        t0 = (col[0:8] - ox) * 1.7
        t1 = (col[24:32] - ox) * 1.7
        t0y = (col[8:16] - ox) * 0.9
        t1y = (col[32:40] - ox) * 0.9
        tn = jnp.maximum(jnp.minimum(t0, t1), jnp.minimum(t0y, t1y))
        tf = jnp.minimum(jnp.maximum(t0, t1), jnp.maximum(t0y, t1y))
        hit8 = (tn <= tf * 1.0001) & (col[48:56] > 0.0)
        return hit8, acc + tn

    pow2 = (1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))

    def body(i, c):
        r, acc = c
        if variant == 0:
            r2 = meta_ref[r]
            return r2, acc + 1.0
        if variant == 1:
            col = fetch32(r)
            acc = acc + col[0:8]
            r2 = meta_ref[r]
            return r2, acc
        if variant == 2:
            col = fetchbf(r)
            hit8, acc = slab(col, acc)
            acc = acc + hit8.astype(jnp.float32)
            r2 = meta_ref[r]
            return r2, acc
        if variant == 3:
            col = fetchbf(r)
            hit8, acc = slab(col, acc)
            any8 = jnp.any(hit8, axis=1, keepdims=True)
            bits = jnp.sum(jnp.where(any8, pow2, 0))
            r2 = meta_ref[(r + bits) & (R - 1)]
            return r2, acc
        # variant 4: cond between internal-ish and leaf-ish work
        def do_int(_):
            col = fetchbf(r)
            hit8, a2 = slab(col, acc)
            any8 = jnp.any(hit8, axis=1, keepdims=True)
            bits = jnp.sum(jnp.where(any8, pow2, 0))
            return bits, a2

        def do_leaf(_):
            col = fetch32(r)
            a2 = acc + col[0:8] * col[8:16]
            bits = jnp.sum(jnp.where(col[0:8] * 0 > 1.0, pow2, 0)) + 1
            return bits, a2

        bits, acc = jax.lax.cond((r & 1) == 0, do_int, do_leaf, None)
        r2 = meta_ref[(r + bits) & (R - 1)]
        return r2, acc

    r0 = jnp.zeros((), jnp.int32) + 1
    acc0 = jnp.zeros((8, P), jnp.float32)

    def wbody(c):
        i, r, acc = c
        r, acc = body(i, (r, acc))
        return i + 1, r, acc

    _, r, acc = jax.lax.while_loop(
        lambda c: c[0] < steps, wbody, (jnp.zeros((), jnp.int32), r0, acc0)
    )
    out_ref[0] = acc + r.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("steps", "variant"))
def run(meta, tab, tabi, *, steps, variant):
    return pl.pallas_call(
        functools.partial(kern, steps=steps, variant=variant),
        out_shape=jax.ShapeDtypeStruct((G, 8, P), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(meta, tab, tabi)


meta = jnp.asarray(nxt)
tab = jnp.asarray(tab_f)
tabi = jnp.asarray(tab_i)

S_LO, S_HI = 256, 2048
for v in range(5):
    name = ["v0 scalar ", "v1 fetch32", "v2 fetchbf", "v3 bits   ",
            "v4 cond   "][v]
    try:
        np.asarray(run(meta, tab, tabi, steps=S_LO, variant=v))
        best_lo = best_hi = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(meta, tab, tabi, steps=S_LO, variant=v))
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(run(meta, tab, tabi, steps=S_HI, variant=v))
            best_hi = min(best_hi, time.perf_counter() - t0)
        marg = (best_hi - best_lo) / (S_HI - S_LO) / G
        print(f"{name}: {marg*1e9:7.1f} ns/step")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
