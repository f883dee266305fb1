"""Triangle meshes: watertight intersection, threaded-BVH traversal,
solid-angle sampling.

TPU-native analog of /root/reference/src/shape/triangle.rs + mesh.rs +
aggregate.rs.  All scene triangle meshes are concatenated into one vertex
pool + index table, pre-transformed to render space at build (the reference
does the same per mesh, mesh.rs:39-46).  Intersection implements the
watertight translate-permute-shear algorithm (triangle.rs:173-302 —
algorithm only; the f64 edge-function fallback is omitted, f32 edge
functions use difference_of_products compensation instead).  Traversal is
the stackless threaded BVH from shimmer_tpu.ops.bvh: one int of state per
lane, lock-step ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.bvh import BVHArrays, build_bvh
from shimmer_tpu.ops.math import difference_of_products, safe_sqrt
from shimmer_tpu.ops.sampling import (
    invert_uniform_triangle_sample,
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


@pytree_dataclass
class TriangleSceneData:
    # Vertex pools (render space).
    p: jnp.ndarray          # (V, 3)
    n: jnp.ndarray          # (V, 3) shading normals (zeros if absent)
    uv: jnp.ndarray         # (V, 2)
    # BVH-ordered triangle table (T,):
    indices: jnp.ndarray    # (T, 3) int32 into vertex pool
    material_id: jnp.ndarray    # (T,) int32
    area_light_id: jnp.ndarray  # (T,) int32
    reverse_orientation: jnp.ndarray  # (T,) bool
    # Original-order triangle table (for light sampling by shape index):
    orig_indices: jnp.ndarray  # (T, 3)
    orig_rev: jnp.ndarray      # (T,) bool
    tri_area: jnp.ndarray      # (T,)
    # Threaded BVH:
    node_lo: jnp.ndarray    # (B, 3)
    node_hi: jnp.ndarray    # (B, 3)
    leaf_first: jnp.ndarray  # (B,) -1 = internal
    leaf_count: jnp.ndarray  # (B,)
    skip: jnp.ndarray        # (B,)
    # Packed hot-path tables: XLA TPU gathers cost ~the same per ROW
    # whatever the row width, so the traversal fetches ONE row per node
    # and ONE row per triangle instead of ~21 separate gathers/step.
    packed_nodes: jnp.ndarray  # (B, 16) f32: lo, hi, bits(first,count,skip)
    packed_tris: jnp.ndarray   # (T, 12) f32: p0, p1, p2 (BVH order), pad
    world_min: jnp.ndarray   # (3,)
    world_max: jnp.ndarray   # (3,)
    leaf_size: int = static_field(default=4)
    has_normals: bool = static_field(default=False)
    has_uv: bool = static_field(default=False)


def build_triangle_scene(
    meshes: list[dict], leaf_size: int = 4
) -> TriangleSceneData:
    """Host: concatenate meshes and build the BVH.

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
    bvh = build_bvh(lo, hi, leaf_size)

    # BVH-order permuted tables.
    perm = bvh.perm
    sorted_indices = indices[perm].astype(np.int32)
    sorted_mat = material_id[perm].astype(np.int32)
    sorted_ali = area_light_id[perm].astype(np.int32)
    sorted_rev = rev[perm]

    e1 = tri_p[:, 1] - tri_p[:, 0]
    e2 = tri_p[:, 2] - tri_p[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    nb = bvh.node_lo.shape[0]
    packed_nodes = np.zeros((nb, 16), np.float32)
    packed_nodes[:, 0:3] = bvh.node_lo
    packed_nodes[:, 3:6] = bvh.node_hi
    packed_nodes[:, 6] = bvh.leaf_first.view(np.float32)
    packed_nodes[:, 7] = bvh.leaf_count.view(np.float32)
    packed_nodes[:, 8] = bvh.skip.view(np.float32)
    t_n = sorted_indices.shape[0]
    packed_tris = np.zeros((t_n, 12), np.float32)
    sorted_tri_p = p[sorted_indices]  # (T, 3, 3) in BVH order
    packed_tris[:, 0:9] = sorted_tri_p.reshape(t_n, 9)

    return TriangleSceneData(
        p=jnp.asarray(p),
        n=jnp.asarray(n),
        uv=jnp.asarray(uv),
        indices=jnp.asarray(sorted_indices),
        material_id=jnp.asarray(sorted_mat),
        area_light_id=jnp.asarray(sorted_ali),
        reverse_orientation=jnp.asarray(sorted_rev),
        orig_indices=jnp.asarray(indices),
        orig_rev=jnp.asarray(rev),
        tri_area=jnp.asarray(area, jnp.float32),
        node_lo=jnp.asarray(bvh.node_lo),
        node_hi=jnp.asarray(bvh.node_hi),
        leaf_first=jnp.asarray(bvh.leaf_first),
        leaf_count=jnp.asarray(bvh.leaf_count),
        skip=jnp.asarray(bvh.skip),
        packed_nodes=jnp.asarray(packed_nodes),
        packed_tris=jnp.asarray(packed_tris),
        world_min=jnp.asarray(lo.min(axis=0)),
        world_max=jnp.asarray(hi.max(axis=0)),
        leaf_size=bvh.leaf_size,
        has_normals=any_n,
        has_uv=any_uv,
    )


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
    """Lock-step threaded-BVH traversal.

    Returns (t, tri_idx, b1, b2) with tri_idx = -1 for misses.  The
    reference's near-child-first ordered stack walk (aggregate.rs:71-139)
    becomes ``next = hit ? node+1 : skip``: fixed DFS order, zero per-lane
    stack, identical results.

    Performance shape (measured on v5e through XLA): a random row gather
    costs ~0.3-1.5 ms per step for 32k-512k lanes *regardless of row
    width*, so the loop body does exactly 1 node-row gather plus
    ``leaf_size`` triangle-row gathers from pre-packed tables — not the
    ~21 separate column gathers of the naive layout.
    """
    n = ray_o.shape[0]
    n_nodes = tris.packed_nodes.shape[0]
    inv_d = 1.0 / jnp.where(ray_d == 0.0, 1e-30, ray_d)

    def cond(state):
        node, t_best, tri_best, b1, b2, found = state
        active = node < n_nodes
        if any_hit:
            active = active & ~found
        return jnp.any(active)

    def body(state):
        node, t_best, tri_best, b1, b2, found = state
        nd = jnp.minimum(node, n_nodes - 1)
        active = node < n_nodes
        if any_hit:
            active = active & ~found
        row = tris.packed_nodes[nd]              # ONE gather
        lo = row[..., 0:3]
        hi = row[..., 3:6]
        first = jax.lax.bitcast_convert_type(row[..., 6], jnp.int32)
        count = jax.lax.bitcast_convert_type(row[..., 7], jnp.int32)
        skip = jax.lax.bitcast_convert_type(row[..., 8], jnp.int32)
        t0 = (lo - ray_o) * inv_d
        t1 = (hi - ray_o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # Conservative slab test (bounding_box.rs:483-553): pad t_far.
        hit_box = (
            (t_near <= t_far * 1.0001) & (t_far > 0.0) & (t_near < t_best)
        ) & active
        is_leaf = first >= 0
        test_leaf = hit_box & is_leaf
        for k in range(tris.leaf_size):
            in_leaf = test_leaf & (k < count)
            tri = jnp.where(in_leaf, first + k, 0)
            trow = tris.packed_tris[tri]         # ONE gather per leaf slot
            p0 = trow[..., 0:3]
            p1 = trow[..., 3:6]
            p2 = trow[..., 6:9]
            h, t, bb0, bb1, bb2 = intersect_triangle(
                ray_o, ray_d, t_best, p0, p1, p2
            )
            closer = h & in_leaf & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            tri_best = jnp.where(closer, tri, tri_best)
            b1 = jnp.where(closer, bb1, b1)
            b2 = jnp.where(closer, bb2, b2)
            found = found | closer
        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, nd + 1, skip)
        node = jnp.where(active, nxt, node)
        return (node, t_best, tri_best, b1, b2, found)

    state = (
        jnp.zeros(n, jnp.int32),
        jnp.asarray(t_max, jnp.float32),
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, bool),
    )
    node, t_best, tri_best, b1, b2, found = jax.lax.while_loop(cond, body, state)
    return t_best, tri_best, b1, b2


def triangle_scene_intersect(
    tris: TriangleSceneData, ray_o, ray_d, t_max
) -> SurfaceInteraction:
    """Closest-hit + interaction construction
    (triangle.rs:305-504 interaction_from_intersection)."""
    # Traversal runs on detached rays (lax.while_loop is not reverse-mode
    # differentiable, and hit *topology* is discrete anyway); the hit is
    # then recomputed differentiably for the chosen triangle — the standard
    # detached-traversal construction for differentiable rendering.
    t_det, tri, _, _ = _traverse(
        tris,
        jax.lax.stop_gradient(ray_o),
        jax.lax.stop_gradient(ray_d),
        jax.lax.stop_gradient(t_max),
        any_hit=False,
    )
    valid = tri >= 0
    tri_c = jnp.maximum(tri, 0)
    idx, p0, p1, p2 = _gather_tri(tris, tri_c)
    _, t, b0, b1, b2 = intersect_triangle(
        ray_o, ray_d, jnp.full(ray_o.shape[:-1], jnp.inf), p0, p1, p2
    )
    t = jnp.where(valid, t, jnp.inf)
    p_hit = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2

    dp02 = p0 - p2
    dp12 = p1 - p2
    ng = cross(dp02, dp12)
    degenerate = length_squared(ng) < 1e-24
    n_geom = normalize(jnp.where(degenerate[..., None], jnp.array([0.0, 0.0, 1.0]), ng))

    # UVs (default (0,0),(1,0),(1,1) — triangle.rs:361-369).
    if tris.has_uv:
        uv0 = tris.uv[idx[..., 0]]
        uv1 = tris.uv[idx[..., 1]]
        uv2 = tris.uv[idx[..., 2]]
        no_uv = (
            (jnp.sum(jnp.abs(uv0), -1) + jnp.sum(jnp.abs(uv1), -1) + jnp.sum(jnp.abs(uv2), -1))
            == 0.0
        )
        uv0 = jnp.where(no_uv[..., None], jnp.array([0.0, 0.0]), uv0)
        uv1 = jnp.where(no_uv[..., None], jnp.array([1.0, 0.0]), uv1)
        uv2 = jnp.where(no_uv[..., None], jnp.array([1.0, 1.0]), uv2)
    else:
        uv0 = jnp.zeros(p0.shape[:-1] + (2,))
        uv1 = jnp.broadcast_to(jnp.array([1.0, 0.0]), uv0.shape)
        uv2 = jnp.broadcast_to(jnp.array([1.0, 1.0]), uv0.shape)
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

    rev = tris.reverse_orientation[tri_c]
    n_geom = jnp.where(rev[..., None], -n_geom, n_geom)

    # Shading normals (triangle.rs:418-504).
    if tris.has_normals:
        ns0 = tris.n[idx[..., 0]]
        ns1 = tris.n[idx[..., 1]]
        ns2 = tris.n[idx[..., 2]]
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
        material_id=jnp.where(valid, tris.material_id[tri_c], -1),
        area_light_id=jnp.where(valid, tris.area_light_id[tri_c], -1),
    )


def triangle_scene_occluded(tris: TriangleSceneData, ray_o, ray_d, t_max):
    """Any-hit shadow query (aggregate.rs:141-203 intersect_predicate).
    Visibility is discrete — evaluated on detached rays."""
    t, tri, _, _ = _traverse(
        tris,
        jax.lax.stop_gradient(ray_o),
        jax.lax.stop_gradient(ray_d),
        jax.lax.stop_gradient(t_max),
        any_hit=True,
    )
    return tri >= 0


# --- area-light sampling over original triangle ids (triangle.rs:548-745) ---


def _orig_tri_verts(tris: TriangleSceneData, tri_idx):
    idx = tris.orig_indices[tri_idx]
    return tris.p[idx[..., 0]], tris.p[idx[..., 1]], tris.p[idx[..., 2]]


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
    rev = tris.orig_rev[tri_idx]
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
