"""Micro: per-lane gather from small tables vs select-chain vs one-hot
matmul, plus sampler-draw cost before/after the _perm_digit fix."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench as B


def honest(f, args_of, reps=5, warmup=1):
    out = None
    for r in range(warmup):
        out = f(*args_of(100 + r))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*args_of(r))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


N = 1 << 16
rng = np.random.default_rng(0)
idx24 = jnp.asarray(rng.integers(0, 24, N).astype(np.uint32))
idx3 = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
tab24 = jnp.asarray(rng.integers(0, 255, 24).astype(np.uint32))
tab3w = jnp.asarray(rng.normal(size=(3, 471)).astype(np.float32))

# empty-dispatch baseline (tunnel overhead)
base = honest(jax.jit(lambda i: (i + 1).sum()), lambda r: (idx3 + r,))
B.log(f"baseline dispatch+sum @{N}: {base*1e3:7.2f} ms")

g = honest(jax.jit(lambda i: tab24[i].sum()), lambda r: ((idx24 + r) % 24,))
B.log(f"gather (24,) u32: {g*1e3:7.2f} ms (-base {((g-base))*1e3:6.2f})")


def selchain(i):
    out = jnp.zeros_like(i)
    for q in range(24):
        out = jnp.where(i == q, tab24[q], out)
    return out.sum()


s = honest(jax.jit(selchain), lambda r: ((idx24 + r) % 24,))
B.log(f"selchain (24,) u32: {s*1e3:7.2f} ms (-base {((s-base))*1e3:6.2f})")

g2 = honest(jax.jit(lambda i: tab3w[i].sum(-1).sum()), lambda r: ((idx3 + r) % 3,))
B.log(f"gather (3,471) f32: {g2*1e3:7.2f} ms (-base {((g2-base))*1e3:6.2f})")


def onehot(i):
    oh = (i[:, None] == jnp.arange(3)).astype(jnp.float32)
    return (oh @ tab3w).sum()


o = honest(jax.jit(onehot), lambda r: ((idx3 + r) % 3,))
B.log(f"onehot (3,471) f32: {o*1e3:7.2f} ms (-base {((o-base))*1e3:6.2f})")

# sampler draws after the _perm_digit fix
from shimmer_tpu.samplers import ZSobolSampler

sampler = ZSobolSampler(8, (1280, 720))
px = jnp.asarray(
    np.stack([np.arange(N) % 1280, (np.arange(N) // 1280) % 720], -1),
    jnp.int32,
)
st0 = sampler.start_pixel_sample(px, jnp.uint32(1))


def draws(ph):
    from shimmer_tpu.samplers import SamplerState

    s = SamplerState(pixel_hash=ph, sample_index=st0.sample_index, dim=st0.dim)
    tot = jnp.zeros(N)
    for _ in range(4):
        u, s = sampler.get_1d(s)
        u2, s = sampler.get_2d(s)
        tot = tot + u + u2.sum(-1)
    return tot.sum()


d = honest(jax.jit(draws), lambda r: (st0.pixel_hash + r,))
B.log(f"sampler 4x(1d+2d) AFTER fix @{N}: {d*1e3:7.2f} ms (-base {(d-base)*1e3:6.2f})")
