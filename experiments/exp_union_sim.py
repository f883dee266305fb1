"""Host simulation: node-visit counts for per-ray vs shared-stack packet
traversal of the real bench-scene BVH8, for primary rays (coherent,
consecutive pixels) and bounce-like rays (hemisphere at hit points).

Decides the packet-kernel design: packet cost = V_union(packet) steps;
per-ray XLA cost = V_single steps.  Inflation = V_union / mean(V_single).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import bench as B

n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
scene, cam, film, n_tri = B.build_bench_scene(n_tris)
tris = scene.triangles
rows = np.asarray(tris.rows8)   # (R, 128)
R = rows.shape[0]
count = rows[:, 80].astype(np.int32)
base = rows[:, 48].astype(np.int32)
print(f"tris={n_tri} rows={R}")

# camera rays for a pixel block
w, h = film.resolution


def primary_rays(n, x0=500, y0=300):
    xs = (np.arange(n) % 16) + x0
    ys = (np.arange(n) // 16) + y0
    px = np.stack([xs, ys], -1).astype(np.float32) + 0.5
    import jax.numpy as jnp
    ray = cam.generate_ray(jnp.asarray(px), jnp.zeros((n, 2), np.float32))
    return np.asarray(ray.o), np.asarray(ray.d)


def slab8(row, o, d_inv, t_best):
    t0 = (row[0:48].reshape(6, 8)[:3] - o[:, None]) * d_inv[:, None]
    t1 = (row[0:48].reshape(6, 8)[3:] - o[:, None]) * d_inv[:, None]
    tn = np.minimum(t0, t1).max(0)
    tf = np.maximum(t0, t1).min(0)
    return (tn <= tf * 1.0001) & (tf > 0) & (tn < t_best)


def tri_hits(row, o, d, t_best):
    # approximate: just return min over valid tris of watertight-ish t
    c = int(row[80])
    p0 = row[0:24].reshape(3, 8).T[:c]
    p1 = row[24:48].reshape(3, 8).T[:c]
    p2 = row[48:72].reshape(3, 8).T[:c]
    e1 = p1 - p0
    e2 = p2 - p0
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


def traverse_single(o, d):
    d_inv = 1.0 / np.where(d == 0, 1e-30, d)
    t_best = np.inf
    stack = [0]
    visits = 0
    while stack:
        r = stack.pop()
        visits += 1
        if count[r] > 0:
            t = tri_hits(rows[r], o, d, t_best)
            if t is not None:
                t_best = t
        else:
            hit = slab8(rows[r], o, d_inv, t_best)
            for j in np.nonzero(hit)[0][::-1]:
                stack.append(base[r] + j)
    return visits, t_best


def traverse_packet(os_, ds, order_near=True):
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
                t = tri_hits(rows[r], os_[i], ds[i], t_best[i])
                if t is not None:
                    t_best[i] = t
        else:
            any_hit = np.zeros(8, bool)
            for i in range(n):
                any_hit |= slab8(rows[r], os_[i], d_inv[i], t_best[i])
            for j in np.nonzero(any_hit)[0][::-1]:
                stack.append(base[r] + j)
    return visits


for P in (32, 128, 256):
    o, d = primary_rays(P)
    singles = [traverse_single(o[i], d[i])[0] for i in range(P)]
    vu = traverse_packet(o, d)
    print(f"PRIMARY  P={P:4d}: mean single={np.mean(singles):7.1f}  "
          f"union={vu:6d}  inflation={vu/np.mean(singles):5.2f}  "
          f"ray-steps/ray = {vu:6d} vs {np.mean(singles):7.1f}")

# bounce-like: random hemisphere directions from points on the mesh surface
rng = np.random.default_rng(0)
o, d = primary_rays(256)
hits = []
for i in range(256):
    v, t = traverse_single(o[i], d[i])
    if np.isfinite(t):
        hits.append(o[i] + t * d[i] * 0.999)
hits = np.asarray(hits)
print(f"bounce origins: {len(hits)}")
if len(hits) >= 128:
    for P in (128,):
        ph = hits[:P]
        dd = rng.standard_normal((P, 3))
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        singles = [traverse_single(ph[i], dd[i])[0] for i in range(P)]
        vu = traverse_packet(ph, dd)
        print(f"BOUNCE   P={P:4d}: mean single={np.mean(singles):7.1f}  "
              f"union={vu:6d}  inflation={vu/np.mean(singles):5.2f}")
        # sorted by direction octant
        oct_ = (dd[:, 0] > 0) * 1 + (dd[:, 1] > 0) * 2 + (dd[:, 2] > 0) * 4
        idx = np.argsort(oct_)
        vu2 = 0
        for g in range(0, P, 32):
            vu2 += traverse_packet(ph[idx[g:g+32]], dd[idx[g:g+32]])
        print(f"BOUNCE sorted 32-packets: total={vu2}  per-32 avg={vu2/ (P//32):7.1f}")
