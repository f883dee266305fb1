"""Host sim for the r5 kernel redesign decisions.

Questions (VERDICT r4 items 2-3):
  a. What fraction of packet union visits are LEAF rows?  → payoff of a
     dual-stack kernel that overlaps one internal + one leaf visit per
     step (steps = max(int, leaf) instead of int + leaf).
  b. Does near-child-first ordered popping (by the packet's dominant
     direction octant) shrink the union via better t_best pruning?
  c. Do 64-lane half-packets meaningfully shrink the union?
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
rows = np.asarray(tris.rows8)
R = rows.shape[0]
count = rows[:, 80].astype(np.int32)
base = rows[:, 48].astype(np.int32)
# centroid z-order per child slot for near-first ordering
print(f"tris={n_tri} rows={R} leaf_rows={(count > 0).sum()}")

w, h = film.resolution


def primary_rays(n, x0=500, y0=300):
    import jax.numpy as jnp

    xs = (np.arange(n) % 16) + x0
    ys = (np.arange(n) // 16) + y0
    px = np.stack([xs, ys], -1).astype(np.float32) + 0.5
    ray = cam.generate_ray(jnp.asarray(px), jnp.zeros((n, 2), np.float32))
    return np.asarray(ray.o), np.asarray(ray.d)


def slab8(row, o, d_inv, t_best):
    t0 = (row[0:48].reshape(6, 8)[:3] - o[:, None]) * d_inv[:, None]
    t1 = (row[0:48].reshape(6, 8)[3:] - o[:, None]) * d_inv[:, None]
    tn = np.minimum(t0, t1).max(0)
    tf = np.maximum(t0, t1).min(0)
    return (tn <= tf * 1.0001) & (tf > 0) & (tn < t_best), tn


def tri_hits(row, o, d, t_best):
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


def traverse_packet(os_, ds, order="slot"):
    """Packet traversal; returns (internal_visits, leaf_visits).

    order: "slot" = lsb-first (current kernel), "near" = children sorted
    by packet-mean entry t (ascending), "octant" = slot order flipped by
    the packet's dominant direction sign on the node's split axis proxy
    (here: mean tn as well, it is what an octant pop approximates)."""
    n = os_.shape[0]
    d_inv = 1.0 / np.where(ds == 0, 1e-30, ds)
    t_best = np.full(n, np.inf)
    stack = [0]
    vis_int = vis_leaf = 0
    while stack:
        r = stack.pop()
        if count[r] > 0:
            vis_leaf += 1
            for i in range(n):
                t = tri_hits(rows[r], os_[i], ds[i], t_best[i])
                if t is not None:
                    t_best[i] = t
        else:
            vis_int += 1
            any_hit = np.zeros(8, bool)
            tn_sum = np.zeros(8)
            for i in range(n):
                hit, tn = slab8(rows[r], os_[i], d_inv[i], t_best[i])
                any_hit |= hit
                tn_sum += np.where(hit, tn, 0.0)
            js = np.nonzero(any_hit)[0]
            if order == "near" and len(js) > 1:
                # sort ascending mean-tn; push far first so near pops first
                mean_tn = tn_sum[js] / 1.0
                js = js[np.argsort(-mean_tn)]
            else:
                js = js[::-1]
            for j in js:
                stack.append(base[r] + j)
    return vis_int, vis_leaf


def report(name, o, d):
    for order in ("slot", "near"):
        vi, vl = traverse_packet(o, d, order=order)
        print(
            f"{name:8s} P={len(o):4d} order={order:5s}: union={vi + vl:5d} "
            f"(int {vi}, leaf {vl}, leaf-frac {vl / (vi + vl):.2f})"
        )
    # half packets
    vi0, vl0 = traverse_packet(o[: len(o) // 2], d[: len(o) // 2], "near")
    vi1, vl1 = traverse_packet(o[len(o) // 2:], d[len(o) // 2:], "near")
    print(
        f"{name:8s} 2x half (near): union={vi0 + vl0 + vi1 + vl1:5d} "
        f"vs full, per-half ({vi0 + vl0}, {vi1 + vl1})"
    )


o, d = primary_rays(128)
report("PRIMARY", o, d)

rng = np.random.default_rng(0)
o256, d256 = primary_rays(256)
hits = []
for i in range(256):
    d_inv = 1.0 / np.where(d256[i] == 0, 1e-30, d256[i])
    t_best = np.inf
    stack = [0]
    while stack:
        r = stack.pop()
        if count[r] > 0:
            t = tri_hits(rows[r], o256[i], d256[i], t_best)
            if t is not None:
                t_best = t
        else:
            hit, _ = slab8(rows[r], o256[i], d_inv, t_best)
            for j in np.nonzero(hit)[0][::-1]:
                stack.append(base[r] + j)
    if np.isfinite(t_best):
        hits.append(o256[i] + t_best * d256[i] * 0.999)
hits = np.asarray(hits)
print(f"bounce origins: {len(hits)}")
if len(hits) >= 128:
    hb = hits[:128]
    db = rng.normal(size=(128, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    report("BOUNCE", hb, db)
    # Morton-sorted bounce (what sort_rays gives the kernel)
    keyo = np.argsort(
        (hb[:, 0] * 64).astype(int) * 4096
        + (hb[:, 1] * 64).astype(int) % 64 * 64
    )
    report("BOUNCE-S", hb[keyo], db[keyo])

# single-ray baseline
singles_i = singles_l = 0
for i in range(128):
    d_inv = 1.0 / np.where(d[i] == 0, 1e-30, d[i])
    t_best = np.inf
    stack = [0]
    while stack:
        r = stack.pop()
        if count[r] > 0:
            singles_l += 1
            t = tri_hits(rows[r], o[i], d[i], t_best)
            if t is not None:
                t_best = t
        else:
            singles_i += 1
            hit, _ = slab8(rows[r], o[i], d_inv, t_best)
            for j in np.nonzero(hit)[0][::-1]:
                stack.append(base[r] + j)
print(
    f"SINGLE primary mean visits/ray: {(singles_i + singles_l) / 128:.1f} "
    f"(int {singles_i / 128:.1f}, leaf {singles_l / 128:.1f})"
)


# --- octant-directed approximation of near-first ---------------------
# Build-side: per internal node pick the axis with largest child-centroid
# spread, sort children along it; kernel-side: pop ascending or
# descending by the packet's majority direction sign on that axis.
cent = np.zeros((R, 8, 3), np.float32)
valid8 = np.zeros((R, 8), bool)
for r in range(R):
    if count[r] == 0:
        b = rows[r, 0:48].reshape(6, 8)
        lo_, hi_ = b[:3], b[3:]
        ok = rows[r, 80 + 0] >= 0  # placeholder
        v = (lo_[0] <= hi_[0])
        cent[r] = ((lo_ + hi_) * 0.5).T
        valid8[r] = lo_[0] <= hi_[0] + 1e30  # all slots; empties have inf boxes
axis_of = np.zeros(R, np.int32)
order_of = np.zeros((R, 8), np.int32)
for r in range(R):
    if count[r] == 0:
        c = cent[r]
        spread = c.max(0) - c.min(0)
        ax = int(np.argmax(spread))
        axis_of[r] = ax
        order_of[r] = np.argsort(c[:, ax], kind="stable")


def traverse_packet_octant(os_, ds):
    n = os_.shape[0]
    d_inv = 1.0 / np.where(ds == 0, 1e-30, ds)
    t_best = np.full(n, np.inf)
    # majority signs
    neg = (ds < 0).mean(0) > 0.5
    stack = [0]
    vi = vl = 0
    while stack:
        r = stack.pop()
        if count[r] > 0:
            vl += 1
            for i in range(n):
                t = tri_hits(rows[r], os_[i], ds[i], t_best[i])
                if t is not None:
                    t_best[i] = t
        else:
            vi += 1
            any_hit = np.zeros(8, bool)
            for i in range(n):
                hit, _ = slab8(rows[r], os_[i], d_inv[i], t_best[i])
                any_hit |= hit
            js = np.nonzero(any_hit)[0]
            ax = axis_of[r]
            # children sorted ascending along ax: near-first means pop
            # low-coordinate first when dir>0 → push far first
            ordering = order_of[r][::-1] if not neg[ax] else order_of[r]
            for j in ordering:
                if any_hit[j]:
                    stack.append(base[r] + j)
    return vi, vl


for nm, oo, dd in (
    ("PRIMARY", o, d),
    ("BOUNCE", hits[:128], rng.normal(size=(128, 3))),
):
    if nm == "BOUNCE":
        dd = dd / np.linalg.norm(dd, axis=1, keepdims=True)
    vi, vl = traverse_packet_octant(oo, dd)
    print(f"{nm:8s} octant-order: union={vi + vl:5d} (int {vi}, leaf {vl})")


def traverse_packet_near_int_only(os_, ds):
    """Near-ordering applied to internal children only; leaf children
    pushed in slot order (cheaper kernel: one rank pass per visit)."""
    n = os_.shape[0]
    d_inv = 1.0 / np.where(ds == 0, 1e-30, ds)
    t_best = np.full(n, np.inf)
    stack = [0]
    vi = vl = 0
    while stack:
        r = stack.pop()
        if count[r] > 0:
            vl += 1
            for i in range(n):
                t = tri_hits(rows[r], os_[i], ds[i], t_best[i])
                if t is not None:
                    t_best[i] = t
        else:
            vi += 1
            any_hit = np.zeros(8, bool)
            tn_min = np.full(8, np.inf)
            for i in range(n):
                hit, tn = slab8(rows[r], os_[i], d_inv[i], t_best[i])
                any_hit |= hit
                tn_min = np.where(hit, np.minimum(tn_min, tn), tn_min)
            js = np.nonzero(any_hit)[0]
            is_lf = count[base[r] + js] > 0
            # push far-first so near pops first; leaves pushed LAST so
            # they pop FIRST (dual-stack drains leaves concurrently —
            # popping them early approximates that for pruning)
            ints = js[~is_lf]
            ints = ints[np.argsort(-tn_min[ints])]
            lfs = js[is_lf][::-1]
            for j in ints:
                stack.append(base[r] + j)
            for j in lfs:
                stack.append(base[r] + j)
    return vi, vl


for nm, oo, dd in (
    ("PRIMARY", o, d),
    ("BOUNCE", hits[:128], None),
):
    if dd is None:
        dd = rng.normal(size=(128, 3))
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    vi, vl = traverse_packet_near_int_only(oo, dd)
    print(f"{nm:8s} near-int-only: union={vi + vl:5d} (int {vi}, leaf {vl})")
