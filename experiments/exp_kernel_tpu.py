"""Compile + validate + honest-benchmark the Pallas packet traversal on
the real TPU against the XLA bitstack path, on the bench scene.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from shimmer_tpu.ops.pallas.traverse import traverse_packets
from shimmer_tpu.shapes.triangle import _traverse

n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
scene, cam, film, n_tri = B.build_bench_scene(n_tris)
tris = scene.triangles
R = tris.rows8.shape[0]
B.log(f"scene: {n_tri} tris, {R} rows ({R*512/1e6:.1f} MB table)")

w, h = film.resolution
rng = np.random.default_rng(0)


def camera_rays(n):
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    px = jnp.asarray(np.stack([xs, ys], -1))
    ray = cam.generate_ray(px, jnp.zeros((n, 2), np.float32))
    return ray.o, ray.d


def honest(f, make_args, reps=3):
    out = f(*make_args(99))
    chk = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for r in range(reps):
        out = f(*make_args(r))
        chk += float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps, chk


N = 1 << 20
o, d = camera_rays(N)
t_max = jnp.full((N,), jnp.inf)

# --- validate on a slice vs XLA ---
NS = 1 << 14
tp, trip, b0p, b1p, _, vp = jax.jit(
    lambda o, d, tm: traverse_packets(tris, o, d, tm)
)(o[:NS], d[:NS], t_max[:NS])
tx, trix, b0x, b1x, _, vx = jax.jit(
    lambda o, d, tm: _traverse(tris, o, d, tm)
)(o[:NS], d[:NS], t_max[:NS])
tx = jnp.where(trix >= 0, tx, jnp.inf)
hp = np.asarray(trip) >= 0
hx = np.asarray(trix) >= 0
agree = (hp == hx).mean()
terr = np.abs(np.asarray(tp)[hp & hx] - np.asarray(tx)[hp & hx])
rel = terr / np.maximum(np.asarray(tx)[hp & hx], 1e-6)
B.log(f"validate: hit-agree={agree:.6f} hits={hp.sum()}  max rel t err={rel.max():.2e}")
same_tri = (np.asarray(trip)[hp & hx] == np.asarray(trix)[hp & hx]).mean()
B.log(f"same winning tri: {same_tri:.6f}")

# --- bench closest-hit on 1M camera rays ---
f_p = jax.jit(lambda o, d, tm: traverse_packets(tris, o, d, tm)[0].sum())
f_x = jax.jit(lambda o, d, tm: jnp.where(
    _traverse(tris, o, d, tm)[1] >= 0, _traverse(tris, o, d, tm)[0], 0.0).sum())

dt, chk = honest(f_p, lambda r: (o + 1e-5 * r, d, t_max))
B.log(f"pallas primary {N} rays: {dt*1e3:8.2f} ms  -> {N/dt/1e6:7.2f} Mrays/s")
steps = jax.jit(lambda o, d, tm: traverse_packets(
    tris, o, d, tm, return_steps=True)[6][::128].sum())(o, d, t_max)
n_pk = N // 128
B.log(f"  steps/packet: {float(steps)/n_pk:.1f}  "
      f"({dt/n_pk/max(1.0, float(steps)/n_pk)*1e9:.0f} ns/step)")
dt, chk = honest(f_x, lambda r: (o + 1e-5 * r, d, t_max), reps=1)
B.log(f"xla    primary {N} rays: {dt*1e3:8.2f} ms  -> {N/dt/1e6:7.2f} Mrays/s")

# --- bounce-like rays: hit points + random directions ---
t_hit, tri_hit, *_ = jax.jit(lambda o, d, tm: traverse_packets(tris, o, d, tm))(o, d, t_max)
hitm = np.asarray(tri_hit) >= 0
ph = np.asarray(o)[hitm] + np.asarray(t_hit)[hitm, None] * np.asarray(d)[hitm] * 0.999
M = (len(ph) // 128) * 128
ph = jnp.asarray(ph[:M])
dd = rng.standard_normal((M, 3)).astype(np.float32)
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
dd = jnp.asarray(dd)
tmaxb = jnp.full((M,), jnp.inf)
dt, chk = honest(f_p, lambda r: (ph + 1e-5 * r, dd, tmaxb))
B.log(f"pallas bounce {M} rays: {dt*1e3:8.2f} ms  -> {M/dt/1e6:7.2f} Mrays/s")

# --- any-hit (shadow-like): toward a point light above ---
lp = jnp.asarray([0.0, 4.0, 0.0])
dl = lp[None, :] - ph
dist = jnp.linalg.norm(dl, axis=1, keepdims=True)
dl = dl / dist
f_s = jax.jit(lambda o, d, tm: traverse_packets(tris, o, d, tm, any_hit=True)[1].sum())
dt, chk = honest(f_s, lambda r: (ph + 1e-5 * r, dl, dist[:, 0] * 0.999))
B.log(f"pallas shadow {M} rays: {dt*1e3:8.2f} ms  -> {M/dt/1e6:7.2f} Mrays/s")
