"""Triangle meshes: watertight intersection, fat-row threaded-BVH
traversal, solid-angle sampling.

TPU-native analog of /root/reference/src/shape/triangle.rs + mesh.rs +
aggregate.rs.  All scene triangle meshes are concatenated into one vertex
pool + index table, pre-transformed to render space at build (the reference
does the same per mesh, mesh.rs:39-46).  Intersection implements the
watertight translate-permute-shear algorithm (triangle.rs:173-302 —
algorithm only; the f64 edge-function fallback is omitted, f32 edge
functions use difference_of_products compensation instead).

Traversal performance model (measured on TPU v5e): an XLA row gather costs
~5 ns/row *regardless of row width up to 128 floats*, so the design goal is
the minimum number of gather steps per ray query.  Each while-loop step
fetches ONE 512-byte node row:

* internal rows carry BOTH child boxes, so the walk only ever lands on
  nodes whose box is known to intersect the ray (plus cheap threaded-skip
  landings) — the reference's ordered stack walk (aggregate.rs:71-139)
  becomes ``next = hitL ? left : hitR ? right : skip``;
* leaf rows carry up to 8 triangles inline (vertices + ids), so leaf
  processing and the hit vertices are gather-free;
* post-traversal shading attributes (uv / shading normals / material ids)
  come from ONE packed 128-byte attribute row per hit.

Integer topology fields are stored as exact small floats (< 2^24) — no bit
casts, so NaN canonicalization or denormal flushing cannot corrupt the
tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.bvh import (
    FAT_MAX_LEAF,
    _FAT_COUNT,
    _FAT_IDS,
    _FAT_RIGHT,
    _FAT_SKIP,
    _FAT_TRI0,
    build_bvh,
    pack_fat_bvh,
)
from shimmer_tpu.ops.math import difference_of_products
from shimmer_tpu.ops.sampling import (
    sample_spherical_triangle,
    sample_uniform_triangle,
)
from shimmer_tpu.ops.vecmath import (
    cross,
    distance_squared,
    dot,
    length,
    length_squared,
    normalize,
    spherical_triangle_area,
)
from shimmer_tpu.shapes.interaction import SurfaceInteraction
from shimmer_tpu.utils.pytree import pytree_dataclass, static_field

# Solid-angle sampling thresholds (triangle.rs:548-560 / pbrt).
MIN_SPHERICAL_SAMPLE_AREA = 3e-4
MAX_SPHERICAL_SAMPLE_AREA = 6.22

# Attribute-row columns (one (32,) f32 row per BVH-sorted triangle).
_ATTR_W = 32
_A_UV = 0        # 0:6   uv0, uv1, uv2
_A_NS = 6        # 6:15  n0, n1, n2 (zeros when the mesh has no normals)
_A_MAT = 15      # material id (may be -1)
_A_ALI = 16      # area light id (may be -1)
_A_REV = 17      # reverse_orientation flag (0/1)
_A_ORIG = 18     # original (pre-BVH-sort) triangle index

# Light-row columns (one (16,) f32 row per ORIGINAL-order triangle).
_LIGHT_W = 16    # 0:9 p0,p1,p2 | 9 rev


@pytree_dataclass
class TriangleSceneData:
    # Vertex pools (render space) — kept for sampling + the optional
    # differentiable re-intersection path.
    p: jnp.ndarray          # (V, 3)
    n: jnp.ndarray          # (V, 3) shading normals (zeros if absent)
    uv: jnp.ndarray         # (V, 2)
    # BVH-ordered triangle index table (differentiable re-gather path).
    indices: jnp.ndarray    # (T, 3) int32 into vertex pool
    # Original-order triangle table (light sampling by shape index):
    orig_indices: jnp.ndarray  # (T, 3)
    orig_rev: jnp.ndarray      # (T,) bool
    tri_area: jnp.ndarray      # (T,)
    # Hot-path packed tables:
    fat_nodes: jnp.ndarray   # (B, 128) f32 — see ops/bvh.py layout
    attr_rows: jnp.ndarray   # (T, 32) f32, BVH order
    light_rows: jnp.ndarray  # (T, 16) f32, original order
    world_min: jnp.ndarray   # (3,)
    world_max: jnp.ndarray   # (3,)
    has_normals: bool = static_field(default=False)
    has_uv: bool = static_field(default=False)
    # When True, the chosen triangle is re-intersected differentiably from
    # the vertex pool after the (detached) traversal, so gradients flow to
    # vertex positions.  Costs ~4 extra row gathers per query.
    differentiable_hits: bool = static_field(default=False)


def build_triangle_scene(
    meshes: list[dict],
    leaf_size: int = FAT_MAX_LEAF,
    differentiable_hits: bool = False,
) -> TriangleSceneData:
    """Host: concatenate meshes, build the BVH, pack the fat tables.

    Each mesh dict: ``p`` (V,3 render-space vertices), ``indices`` (T,3),
    optional ``n`` (V,3), ``uv`` (V,2), ``material_id``, ``area_light_id``
    (per mesh scalar or per-tri array), ``reverse_orientation`` bool.
    """
    ps, ns, uvs, idxs = [], [], [], []
    mats, ali, revs = [], [], []
    v_off = 0
    any_n = any("n" in m and m["n"] is not None for m in meshes)
    any_uv = any("uv" in m and m["uv"] is not None for m in meshes)
    for m in meshes:
        p = np.asarray(m["p"], np.float32)
        idx = np.asarray(m["indices"], np.int32).reshape(-1, 3)
        v = p.shape[0]
        t = idx.shape[0]
        ps.append(p)
        n = m.get("n")
        ns.append(
            np.asarray(n, np.float32) if n is not None else np.zeros((v, 3), np.float32)
        )
        uv = m.get("uv")
        uvs.append(
            np.asarray(uv, np.float32)
            if uv is not None
            else np.zeros((v, 2), np.float32)
        )
        idxs.append(idx + v_off)
        mats.append(np.full(t, m.get("material_id", -1), np.int32))
        a = m.get("area_light_id", -1)
        ali.append(
            np.asarray(a, np.int32)
            if np.ndim(a) > 0
            else np.full(t, a, np.int32)
        )
        revs.append(np.full(t, bool(m.get("reverse_orientation", False))))
        v_off += v
    p = np.concatenate(ps)
    n = np.concatenate(ns)
    uv = np.concatenate(uvs)
    indices = np.concatenate(idxs)
    material_id = np.concatenate(mats)
    area_light_id = np.concatenate(ali)
    rev = np.concatenate(revs)

    tri_p = p[indices]  # (T, 3, 3)
    lo = tri_p.min(axis=1)
    hi = tri_p.max(axis=1)
    leaf_size = min(leaf_size, FAT_MAX_LEAF)
    bvh = _build_best_bvh(lo, hi, leaf_size)

    # BVH-order permuted tables.
    perm = bvh.perm
    sorted_indices = indices[perm].astype(np.int32)
    sorted_tri_p = tri_p[perm]  # (T, 3, 3) BVH order
    fat_nodes = pack_fat_bvh(bvh, sorted_tri_p)

    e1 = tri_p[:, 1] - tri_p[:, 0]
    e2 = tri_p[:, 2] - tri_p[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    t_n = sorted_indices.shape[0]
    attr = np.zeros((t_n, _ATTR_W), np.float32)
    tri_uv = uv[sorted_indices]  # (T, 3, 2)
    # Default UVs (0,0),(1,0),(1,1) when a triangle has none
    # (triangle.rs:361-369).
    no_uv = np.abs(tri_uv).sum(axis=(1, 2)) == 0.0
    tri_uv[no_uv] = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], np.float32)
    attr[:, _A_UV : _A_UV + 6] = tri_uv.reshape(t_n, 6)
    attr[:, _A_NS : _A_NS + 9] = n[sorted_indices].reshape(t_n, 9)
    attr[:, _A_MAT] = material_id[perm].astype(np.float32)
    attr[:, _A_ALI] = area_light_id[perm].astype(np.float32)
    attr[:, _A_REV] = rev[perm].astype(np.float32)
    attr[:, _A_ORIG] = perm.astype(np.float32)

    light_rows = np.zeros((t_n, _LIGHT_W), np.float32)
    light_rows[:, 0:9] = tri_p.reshape(t_n, 9)
    light_rows[:, 9] = rev.astype(np.float32)

    return TriangleSceneData(
        p=jnp.asarray(p),
        n=jnp.asarray(n),
        uv=jnp.asarray(uv),
        indices=jnp.asarray(sorted_indices),
        orig_indices=jnp.asarray(indices),
        orig_rev=jnp.asarray(rev),
        tri_area=jnp.asarray(area, jnp.float32),
        fat_nodes=jnp.asarray(fat_nodes),
        attr_rows=jnp.asarray(attr),
        light_rows=jnp.asarray(light_rows),
        world_min=jnp.asarray(lo.min(axis=0)),
        world_max=jnp.asarray(hi.max(axis=0)),
        has_normals=any_n,
        has_uv=any_uv,
        differentiable_hits=differentiable_hits,
    )


def _build_best_bvh(lo, hi, leaf_size):
    """Binned-SAH C++ builder when available, numpy LBVH otherwise."""
    try:
        from shimmer_tpu.native.sah import build_sah_bvh

        return build_sah_bvh(lo, hi, leaf_size)
    except Exception:
        return build_bvh(lo, hi, leaf_size)


def _permute_to_max_z(v, kz):
    """Cyclic-permute (..., 3) vectors so component ``kz`` lands in z.

    kz in {0,1,2}; (kx, ky) = (kz+1, kz+2) mod 3.  Implemented as pure
    lane-wise selects — per-lane ``take_along_axis`` gathers cost ~1000x
    more than VPU selects on TPU (measured; this one change was worth
    ~10x on whole-scene traversal)."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    is0 = kz == 0
    is1 = kz == 1
    ox = jnp.where(is0, vy, jnp.where(is1, vz, vx))
    oy = jnp.where(is0, vz, jnp.where(is1, vx, vy))
    oz = jnp.where(is0, vx, jnp.where(is1, vy, vz))
    return ox, oy, oz


def intersect_triangle(ray_o, ray_d, t_max, p0, p1, p2):
    """Watertight ray-triangle intersection (triangle.rs:173-302).

    All args batched (...,).  Returns (hit, t, b0, b1, b2).
    """
    # Translate to ray origin.
    p0t = p0 - ray_o
    p1t = p1 - ray_o
    p2t = p2 - ray_o
    # Permute so |d_z| is the largest component.
    kz = jnp.argmax(jnp.abs(ray_d), axis=-1)
    dx, dy, dz = _permute_to_max_z(ray_d, kz)
    p0x, p0y, p0z = _permute_to_max_z(p0t, kz)
    p1x, p1y, p1z = _permute_to_max_z(p1t, kz)
    p2x, p2y, p2z = _permute_to_max_z(p2t, kz)
    # Shear to align the ray with +z.
    dz_safe = jnp.where(dz == 0.0, 1.0, dz)
    sx = -dx / dz_safe
    sy = -dy / dz_safe
    sz = 1.0 / dz_safe
    p0x = p0x + sx * p0z
    p0y = p0y + sy * p0z
    p1x = p1x + sx * p1z
    p1y = p1y + sy * p1z
    p2x = p2x + sx * p2z
    p2y = p2y + sy * p2z
    # Signed edge functions (compensated products for watertightness).
    e0 = difference_of_products(p1x, p2y, p1y, p2x)
    e1 = difference_of_products(p2x, p0y, p2y, p0x)
    e2 = difference_of_products(p0x, p1y, p0y, p1x)
    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    det = e0 + e1 + e2
    det_ok = det != 0.0
    # Scaled hit distance.
    p0z = p0z * sz
    p1z = p1z * sz
    p2z = p2z * sz
    t_scaled = e0 * p0z + e1 * p1z + e2 * p2z
    neg = det < 0.0
    t_ok = jnp.where(
        neg,
        (t_scaled <= 1e-7 * det) & (t_scaled > t_max * det),
        (t_scaled >= 1e-7 * det) & (t_scaled < t_max * det),
    )
    hit = same_sign & det_ok & t_ok & (dz != 0.0)
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    return hit, jnp.where(hit, t, jnp.inf), b0, b1, b2


def _gather_tri(tris: TriangleSceneData, tri_idx):
    idx = tris.indices[tri_idx]  # (..., 3)
    p0 = tris.p[idx[..., 0]]
    p1 = tris.p[idx[..., 1]]
    p2 = tris.p[idx[..., 2]]
    return idx, p0, p1, p2


def _traverse(tris: TriangleSceneData, ray_o, ray_d, t_max, any_hit=False):
    """Lock-step fat-row threaded-BVH traversal.

    Returns (t, tri_idx, b0, b1, b2, tri_verts) with tri_idx = -1 for
    misses and tri_verts (..., 9) the winning triangle's vertices (from
    the leaf row, so no post-traversal vertex gather is needed).

    Each step costs ONE row gather (~5 ns/row on v5e regardless of row
    width ≤ 128 f32 — measured); all box/triangle math is VPU-parallel
    across lanes.
    """
    n = ray_o.shape[0]
    nodes = tris.fat_nodes
    n_nodes = nodes.shape[0]
    inv_d = 1.0 / jnp.where(ray_d == 0.0, 1e-30, ray_d)

    def slab(lo, hi, t_best, active):
        t0 = (lo - ray_o) * inv_d
        t1 = (hi - ray_o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # Conservative slab test (bounding_box.rs:483-553): pad t_far.
        return (
            (t_near <= t_far * 1.0001) & (t_far > 0.0) & (t_near < t_best)
        ) & active

    def cond(state):
        node = state[0]
        active = node < n_nodes
        if any_hit:
            active = active & (state[2] < 0)
        return jnp.any(active)

    def body(state):
        node, t_best, tri_best, b0, b1, b2, verts = state
        nd = jnp.minimum(node, n_nodes - 1)
        active = node < n_nodes
        if any_hit:
            active = active & (tri_best < 0)
        row = nodes[nd]                       # ONE fat gather (N, 128)
        count = row[:, _FAT_COUNT].astype(jnp.int32)
        skip = row[:, _FAT_SKIP].astype(jnp.int32)
        is_leaf = count > 0

        # Internal nodes: test both child boxes, descend into the first
        # hit child (its sub-DFS ends with skip = the other child).
        hit_l = slab(row[:, 0:3], row[:, 3:6], t_best, active & ~is_leaf)
        hit_r = slab(row[:, 6:9], row[:, 9:12], t_best, active & ~is_leaf)
        right = row[:, _FAT_RIGHT].astype(jnp.int32)
        nxt = jnp.where(hit_l, nd + 1, jnp.where(hit_r, right, skip))

        # Leaf nodes: intersect up to 8 inline triangles at once.
        trib = row[:, _FAT_TRI0 : _FAT_TRI0 + 9 * FAT_MAX_LEAF].reshape(
            n, FAT_MAX_LEAF, 3, 3
        )
        lane_k = jnp.arange(FAT_MAX_LEAF, dtype=jnp.int32)
        in_leaf = (active & is_leaf)[:, None] & (lane_k[None, :] < count[:, None])
        h, t, bb0, bb1, bb2 = intersect_triangle(
            ray_o[:, None, :],
            ray_d[:, None, :],
            t_best[:, None],
            trib[:, :, 0],
            trib[:, :, 1],
            trib[:, :, 2],
        )
        t = jnp.where(h & in_leaf, t, jnp.inf)
        k_best = jnp.argmin(t, axis=-1)
        oh = (lane_k[None, :] == k_best[:, None])
        t_new = jnp.min(t, axis=-1)
        closer = t_new < t_best
        pick = lambda x: jnp.sum(jnp.where(oh, x, 0.0), axis=-1)
        tri_ids = row[:, _FAT_IDS : _FAT_IDS + FAT_MAX_LEAF]
        t_best = jnp.where(closer, t_new, t_best)
        tri_best = jnp.where(closer, pick(tri_ids).astype(jnp.int32), tri_best)
        b0 = jnp.where(closer, pick(bb0), b0)
        b1 = jnp.where(closer, pick(bb1), b1)
        b2 = jnp.where(closer, pick(bb2), b2)
        verts_new = jnp.sum(
            jnp.where(oh[:, :, None], trib.reshape(n, FAT_MAX_LEAF, 9), 0.0),
            axis=1,
        )
        verts = jnp.where(closer[:, None], verts_new, verts)

        node = jnp.where(active, jnp.where(is_leaf, skip, nxt), node)
        return (node, t_best, tri_best, b0, b1, b2, verts)

    state = (
        jnp.zeros(n, jnp.int32),
        jnp.asarray(jnp.broadcast_to(t_max, (n,)), jnp.float32),
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros((n, 9), jnp.float32),
    )
    node, t_best, tri_best, b0, b1, b2, verts = jax.lax.while_loop(
        cond, body, state
    )
    return t_best, tri_best, b0, b1, b2, verts


def triangle_scene_intersect(
    tris: TriangleSceneData, ray_o, ray_d, t_max
) -> SurfaceInteraction:
    """Closest-hit + interaction construction
    (triangle.rs:305-504 interaction_from_intersection)."""
    # Traversal runs on detached rays (lax.while_loop is not reverse-mode
    # differentiable, and hit *topology* is discrete anyway).
    t, tri, b0, b1, b2, verts = _traverse(
        tris,
        jax.lax.stop_gradient(ray_o),
        jax.lax.stop_gradient(ray_d),
        jax.lax.stop_gradient(t_max),
        any_hit=False,
    )
    valid = tri >= 0
    tri_c = jnp.maximum(tri, 0)

    if tris.differentiable_hits:
        # Re-intersect the chosen triangle from the (differentiable)
        # vertex pool — the standard detached-traversal construction for
        # differentiable rendering; gradients flow to vertex positions.
        _, p0, p1, p2 = _gather_tri(tris, tri_c)
        _, t, b0, b1, b2 = intersect_triangle(
            ray_o, ray_d, jnp.full(ray_o.shape[:-1], jnp.inf), p0, p1, p2
        )
    else:
        p0 = verts[..., 0:3]
        p1 = verts[..., 3:6]
        p2 = verts[..., 6:9]
    t = jnp.where(valid, t, jnp.inf)
    p_hit = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2

    dp02 = p0 - p2
    dp12 = p1 - p2
    ng = cross(dp02, dp12)
    degenerate = length_squared(ng) < 1e-24
    n_geom = normalize(
        jnp.where(degenerate[..., None], jnp.array([0.0, 0.0, 1.0]), ng)
    )

    # Shading attributes: ONE packed row per hit.
    attr = tris.attr_rows[tri_c]             # (N, 32)
    uv0 = attr[..., _A_UV + 0 : _A_UV + 2]
    uv1 = attr[..., _A_UV + 2 : _A_UV + 4]
    uv2 = attr[..., _A_UV + 4 : _A_UV + 6]
    uv_hit = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2

    # dpdu/dpdv from UV deltas (triangle.rs:376-416).
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    det_uv = difference_of_products(
        duv02[..., 0], duv12[..., 1], duv02[..., 1], duv12[..., 0]
    )
    uv_ok = jnp.abs(det_uv) >= 1e-9
    inv_det = 1.0 / jnp.where(uv_ok, det_uv, 1.0)
    dpdu = (
        duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12
    ) * inv_det[..., None]
    dpdv = (
        -duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12
    ) * inv_det[..., None]
    # Degenerate UV mapping: any frame around the geometric normal.
    from shimmer_tpu.ops.vecmath import coordinate_system

    fx, fy = coordinate_system(n_geom)
    bad_uv = ~uv_ok | (length_squared(cross(dpdu, dpdv)) < 1e-24)
    dpdu = jnp.where(bad_uv[..., None], fx, dpdu)
    dpdv = jnp.where(bad_uv[..., None], fy, dpdv)

    rev = attr[..., _A_REV] > 0.5
    n_geom = jnp.where(rev[..., None], -n_geom, n_geom)

    # Shading normals (triangle.rs:418-504).
    if tris.has_normals:
        ns0 = attr[..., _A_NS + 0 : _A_NS + 3]
        ns1 = attr[..., _A_NS + 3 : _A_NS + 6]
        ns2 = attr[..., _A_NS + 6 : _A_NS + 9]
        ns = b0[..., None] * ns0 + b1[..., None] * ns1 + b2[..., None] * ns2
        has_ns = length_squared(ns) > 1e-12
        ns = jnp.where(has_ns[..., None], normalize(ns), n_geom)
        ns = jnp.where(rev[..., None], jnp.where(has_ns[..., None], -ns, ns), ns)
        # Orient geometric normal to the shading hemisphere
        # (pbrt: ng = FaceForward(ng, ns) when shading normals exist).
        n_geom = jnp.where(
            (has_ns & (dot(n_geom, ns) < 0.0))[..., None], -n_geom, n_geom
        )
        dpdus = dpdu
    else:
        ns = n_geom
        dpdus = dpdu

    material_id = attr[..., _A_MAT].astype(jnp.int32)
    area_light_id = attr[..., _A_ALI].astype(jnp.int32)
    return SurfaceInteraction.make(
        valid=valid,
        t=jnp.where(valid, t, jnp.inf),
        p=p_hit,
        n=n_geom,
        uv=uv_hit,
        wo=-normalize(ray_d),
        dpdu=dpdu,
        dpdv=dpdv,
        ns=ns,
        dpdus=dpdus,
        material_id=jnp.where(valid, material_id, -1),
        area_light_id=jnp.where(valid, area_light_id, -1),
    )


def triangle_scene_occluded(tris: TriangleSceneData, ray_o, ray_d, t_max):
    """Any-hit shadow query (aggregate.rs:141-203 intersect_predicate).
    Visibility is discrete — evaluated on detached rays."""
    _, tri, _, _, _, _ = _traverse(
        tris,
        jax.lax.stop_gradient(ray_o),
        jax.lax.stop_gradient(ray_d),
        jax.lax.stop_gradient(t_max),
        any_hit=True,
    )
    return tri >= 0


# --- area-light sampling over original triangle ids (triangle.rs:548-745) ---


def _orig_tri_verts(tris: TriangleSceneData, tri_idx):
    """Vertices of original-order triangle ``tri_idx`` — ONE packed-row
    gather (the light_rows table) instead of index + 3 vertex gathers."""
    row = tris.light_rows[tri_idx]
    return row[..., 0:3], row[..., 3:6], row[..., 6:9]


def triangle_light_sample(tris: TriangleSceneData, tri_idx, ref_p, ref_ns, u):
    """Solid-angle sampling of triangle ``tri_idx`` from ref_p
    (Triangle::sample_with_context).  Returns (p, n, pdf_solid_angle).

    Uses uniform spherical-triangle sampling between the reference's
    area thresholds (the bilinear cos-θ warp of triangle.rs:585-650 is a
    variance optimization we skip; sample & pdf stay consistent)."""
    p0, p1, p2 = _orig_tri_verts(tris, tri_idx)
    solid_angle = spherical_triangle_area(
        normalize(p0 - ref_p), normalize(p1 - ref_p), normalize(p2 - ref_p)
    )
    use_area = (solid_angle < MIN_SPHERICAL_SAMPLE_AREA) | (
        solid_angle > MAX_SPHERICAL_SAMPLE_AREA
    )

    ng = cross(p1 - p0, p2 - p0)
    rev = tris.light_rows[tri_idx][..., 9] > 0.5
    n_unnorm = jnp.where(rev[..., None], -ng, ng)

    # Area sampling path.
    bary_a = sample_uniform_triangle(u)
    p_a = (
        bary_a[..., 0:1] * p0 + bary_a[..., 1:2] * p1 + bary_a[..., 2:3] * p2
    )
    area = 0.5 * length(ng)
    wi_a = p_a - ref_p
    dist2_a = jnp.sum(wi_a * wi_a, -1)
    n_norm = normalize(n_unnorm)
    cos_a = jnp.abs(dot(n_norm, -normalize(wi_a)))
    pdf_a = jnp.where(
        (cos_a > 1e-9) & (dist2_a > 0.0),
        dist2_a / (jnp.maximum(cos_a, 1e-9) * jnp.maximum(area, 1e-12)),
        0.0,
    )

    # Spherical-triangle path.
    bary_s, pdf_s = sample_spherical_triangle(p0, p1, p2, ref_p, u)
    p_s = (
        bary_s[..., 0:1] * p0 + bary_s[..., 1:2] * p1 + bary_s[..., 2:3] * p2
    )

    p_out = jnp.where(use_area[..., None], p_a, p_s)
    pdf = jnp.where(use_area, pdf_a, pdf_s)
    return p_out, n_norm, pdf


def triangle_light_pdf(tris: TriangleSceneData, tri_idx, ref_p, ref_ns, wi, si_p, si_n):
    """pdf_with_context for MIS (triangle.rs:676-745)."""
    p0, p1, p2 = _orig_tri_verts(tris, tri_idx)
    solid_angle = spherical_triangle_area(
        normalize(p0 - ref_p), normalize(p1 - ref_p), normalize(p2 - ref_p)
    )
    use_area = (solid_angle < MIN_SPHERICAL_SAMPLE_AREA) | (
        solid_angle > MAX_SPHERICAL_SAMPLE_AREA
    )
    ng = cross(p1 - p0, p2 - p0)
    area = 0.5 * length(ng)
    dist2 = distance_squared(ref_p, si_p)
    cos_s = jnp.abs(dot(normalize(ng), -normalize(si_p - ref_p)))
    pdf_a = jnp.where(
        cos_s > 1e-9,
        dist2 / (jnp.maximum(cos_s, 1e-9) * jnp.maximum(area, 1e-12)),
        0.0,
    )
    pdf_s = jnp.where(solid_angle > 0.0, 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)
    return jnp.where(use_area, pdf_a, pdf_s)
