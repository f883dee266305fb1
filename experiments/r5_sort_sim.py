"""Host sim: packet-union sensitivity to the bounce-ray sort key.

The kernel's wall is union inflation on incoherent packets; Morton
(origin-major) sorting measured net-negative on-chip in r4.  Here we
form packets from a POOL of bounce rays under different keys and
compare the summed visit unions (smaller = less traversal work).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import bench as B

scene, cam, film, n_tri = B.build_bench_scene(
    int(os.environ.get("BENCH_TRIS", "300000"))
)
tris = scene.triangles
rows = np.asarray(tris.rows8)
count = rows[:, 80].astype(np.int32)
base = rows[:, 48].astype(np.int32)
w, h = film.resolution


def slab8(row, o, d_inv, t_best):
    t0 = (row[0:48].reshape(6, 8)[:3] - o[:, None]) * d_inv[:, None]
    t1 = (row[0:48].reshape(6, 8)[3:] - o[:, None]) * d_inv[:, None]
    tn = np.minimum(t0, t1).max(0)
    tf = np.maximum(t0, t1).min(0)
    return (tn <= tf * 1.0001) & (tf > 0) & (tn < t_best)


def tri_t(row, o, d, t_best):
    c = int(row[80])
    p0 = row[0:24].reshape(3, 8).T[:c]
    p1 = row[24:48].reshape(3, 8).T[:c]
    p2 = row[48:72].reshape(3, 8).T[:c]
    e1, e2 = p1 - p0, p2 - p0
    pv = np.cross(np.broadcast_to(d, e2.shape), e2)
    det = (e1 * pv).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
    tv = o - p0
    u = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1)
    v = (np.broadcast_to(d, qv.shape) * qv).sum(-1) * inv
    t = (e2 * qv).sum(-1) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < t_best)
    return t[hit].min() if hit.any() else None


def union_visits(os_, ds):
    n = os_.shape[0]
    d_inv = 1.0 / np.where(ds == 0, 1e-30, ds)
    t_best = np.full(n, np.inf)
    stack = [0]
    visits = 0
    while stack:
        r = stack.pop()
        visits += 1
        if count[r] > 0:
            for i in range(n):
                t = tri_t(rows[r], os_[i], ds[i], t_best[i])
                if t is not None:
                    t_best[i] = t
        else:
            any_hit = np.zeros(8, bool)
            for i in range(n):
                any_hit |= slab8(rows[r], os_[i], d_inv[i], t_best[i])
            for j in np.nonzero(any_hit)[0][::-1]:
                stack.append(base[r] + j)
    return visits


# pool: 1024 bounce rays from a 32x32 pixel tile's hit points
import jax.numpy as jnp

n_pool = 1024
xs = (np.arange(n_pool) % 32) + 500
ys = (np.arange(n_pool) // 32) + 300
px = np.stack([xs, ys], -1).astype(np.float32) + 0.5
ray = cam.generate_ray(jnp.asarray(px), np.zeros((n_pool, 2), np.float32))
o0, d0 = np.asarray(ray.o), np.asarray(ray.d)
rng = np.random.default_rng(0)
hits = []
for i in range(n_pool):
    d_inv = 1.0 / np.where(d0[i] == 0, 1e-30, d0[i])
    t_best, stack = np.inf, [0]
    while stack:
        r = stack.pop()
        if count[r] > 0:
            t = tri_t(rows[r], o0[i], d0[i], t_best)
            if t is not None:
                t_best = t
        else:
            hit = slab8(rows[r], o0[i], d_inv, t_best)
            for j in np.nonzero(hit)[0][::-1]:
                stack.append(base[r] + j)
    if np.isfinite(t_best):
        hits.append(o0[i] + t_best * d0[i] * 0.999)
hits = np.asarray(hits)
n = (len(hits) // 128) * 128
o = hits[:n]
d = rng.normal(size=(n, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
print(f"pool of {n} bounce rays")

ext = np.maximum(np.asarray(tris.world_max) - np.asarray(tris.world_min), 1e-6)
q = np.clip(((o - np.asarray(tris.world_min)) / ext * 64).astype(int), 0, 63)


def part(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


morton = part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)
octant = (d[:, 0] < 0) + 2 * (d[:, 1] < 0) + 4 * (d[:, 2] < 0)
dq = np.clip(((d + 1) * 2).astype(int), 0, 3)
fine = dq[:, 0] | (dq[:, 1] << 2) | (dq[:, 2] << 4)

keys = {
    "arrival (none)": np.arange(n),
    "origin-major": (morton << 9) | (octant << 6) | fine,
    "dir-major": (octant << 27) | (fine << 21) | (morton << 3),
    "dir-fine-major": ((octant.astype(np.int64) << 40)
                        | (np.clip(((d + 1) * 8).astype(np.int64), 0, 15)
                           @ np.array([1 << 32, 1 << 28, 1 << 24]))
                        | morton),
}
for name, key in keys.items():
    order = np.argsort(key, kind="stable")
    tot = 0
    for s in range(0, n, 128):
        idx = order[s:s + 128]
        tot += union_visits(o[idx], d[idx])
    print(f"{name:16s}: total union over {n//128} packets = {tot}")
