"""Pallas TPU packet-traversal kernel for the 8-wide BVH.

TPU-native replacement for the innermost hot loop of the reference
renderer (/root/reference/src/aggregate.rs:71-139 BvhAggregate::intersect
+ src/shape/triangle.rs:173-302 watertight intersect), designed from the
measured hardware constraints rather than translated:

* Per-lane divergent row gathers are the XLA path's bottleneck: the TPU
  has no vector-indexed load, so an (N,)-indexed gather from HBM costs
  ~0.4 ms per traversal step at 131k lanes, and in-kernel scalar-loop
  emulation costs ~20 ns/row (measured, experiments/exp_pallas_gather2).
* A *scalar*-indexed fetch of one BVH row from a VMEM-resident table is
  nearly free, and the VPU can test that row's 8 child boxes (or 8 leaf
  triangles) against 128 rays as an (8, 128) tile in ~1 op/row.

So the kernel traverses in *packets*: 128 rays share one traversal stack
(classic packet tracing) and every popped node is tested against all
lanes at once.  The whole loop lives in one kernel — traversal state in
registers, the node table in VMEM — so per-step XLA dispatch, HBM state
traffic and the lock-step while_loop sync all disappear.  Host
simulation on the bench scene (experiments/exp_union_sim.py) shows the
shared-stack union visits only ~1.6x the per-ray node count for coherent
camera packets and amortizes to ~3 visits/ray even for incoherent bounce
packets.

Node fetch: rows are (128,) f32 in lane orientation; per-slot broadcast
needs them on *sublanes*.  The lane->sublane move uses the MXU: with
B[l, k] = row[k] (a free sublane broadcast), ``dot(I, B, contract on k)``
yields col[i, l] = row[i] — the transposed row broadcast across all
lanes in one small matmul (measured fastest of four strategies,
experiments/exp_fetch_honest.py).  Identity-matrix matmuls are exact in
f32 on the MXU, but NaN/Inf would poison them — hence the finite packed
rows + explicit slot-valid flags (ops/bvh8.py cols 88:96).

Scenes whose row table exceeds the VMEM budget fall back to the XLA
traversal (shapes/triangle.py::_traverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shimmer_tpu.ops.math import difference_of_products

P = 128                      # rays per packet (one vreg lane dim)
_ROWS_IN = 8                 # input rows per packet: o3 d3 tmax anyflag
_ROWS_OUT = 16               # t, tri, b0, b1, verts9, pad
# VMEM budget for the node table (v5e); larger scenes use the XLA path.
VMEM_TABLE_BYTES = 48 * 1024 * 1024


def _permute3(x, y, z, is0, is1):
    """Cyclic permute so the ray's |d|-max axis lands in z (see
    shapes/triangle.py::_permute_to_max_z — pure selects, no gathers)."""
    ox = jnp.where(is0, y, jnp.where(is1, z, x))
    oy = jnp.where(is0, z, jnp.where(is1, x, y))
    oz = jnp.where(is0, x, jnp.where(is1, y, z))
    return ox, oy, oz


def _traverse_kernel(meta_ref, rays_ref, tab_ref, tab_bf_ref, out_ref,
                     stack_ref, *, stack_size):
    rays = rays_ref[0]                      # (8, P)
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    t_max = rays[6:7]
    want_any = rays[7:8] > 0.0

    inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

    # Watertight precompute (triangle.rs:173-228): permute so |d_z| is
    # max (argmax first-max tiebreak), shear to align the ray with +z.
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    is0 = (adx >= ady) & (adx >= adz)
    is1 = (~is0) & (ady >= adz)
    pdx, pdy, pdz = _permute3(dx, dy, dz, is0, is1)
    dz_ok = pdz != 0.0
    pdz_safe = jnp.where(dz_ok, pdz, 1.0)
    sx = -pdx / pdz_safe
    sy = -pdy / pdz_safe
    sz = 1.0 / pdz_safe

    eye = jnp.eye(128, dtype=jnp.float32)
    # Internal rows only need cols 0:48 (boxes) + 88:96 (valid flags): a
    # (64,128) selector halves the MXU work, and fetching from the
    # pre-split hi|lo bf16 table with two 1-pass dots (vs one 6-pass
    # exact-f32 dot) cuts it ~3x more.  Build-time box dilation
    # (ops/bvh8.py) covers the ~2^-18 relative error of the 2-term
    # bf16 split.
    sel_int = jnp.concatenate(
        [eye[0:48], eye[88:96], jnp.zeros((8, 128), jnp.float32)], axis=0
    ).astype(jnp.bfloat16)                              # (64, 128)
    # Leaf rows need cols 0:80 (9x8 verts + 8 ids), bit-exact: 96 rows
    # at HIGHEST (6-pass, exact f32).
    sel_leaf = eye[0:96]                                # (96, 128)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    pow2 = (1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))

    zero_v = jnp.zeros((1, P), jnp.float32)
    active0 = (t_max > 0.0).astype(jnp.float32)
    init = (
        jnp.int32(1),                        # sp (stack holds root group)
        t_max,                               # t_best
        jnp.full((1, P), -1.0, jnp.float32),  # tri (as float id)
        zero_v, zero_v,                      # b0, b1
        (zero_v,) * 9,                       # winning verts
        active0,                             # active (f32: Mosaic cannot
        #                                      yield i1 vectors from cond)
        jnp.max(active0),                    # alive: scalar mirror of
        #   any(active), refreshed only on leaf steps — keeps the while
        #   cond free of a per-step cross-lane reduction.
    )
    # Stack of packed groups: base << 8 | live-child bitmask.  Pop peels
    # the lowest set bit (one load + ~6 scalar ops + one store — no
    # per-child loop); push is a single store of the whole sibling group.
    stack_ref[0] = 1                         # base 0 (root row), bits 0b1

    def fetch(r):
        """Exact-f32 row fetch (leaf rows): lane->sublane
        transpose-broadcast through the MXU, col[i, l] = row[sel_i]."""
        row = tab_ref[pl.ds(r, 1), :]                       # (1, 128)
        b = jnp.broadcast_to(row, (P, 128))
        return jax.lax.dot_general(
            sel_leaf, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # (96, P)

    def fetch_bf(r):
        """hi+lo bf16 row fetch (internal rows, ~2^-18 relative).
        Rows hold hi<<16|lo packed int32 (bf16 = truncated f32, so each
        half bitcasts to an exact f32 after masking/shifting)."""
        word = tab_bf_ref[pl.ds(r, 1), :]                   # (1, 128) i32
        hi = jax.lax.bitcast_convert_type(
            word & jnp.int32(-65536), jnp.float32
        ).astype(jnp.bfloat16)
        lo = jax.lax.bitcast_convert_type(
            word << 16, jnp.float32
        ).astype(jnp.bfloat16)
        b_hi = jnp.broadcast_to(hi, (P, 128))
        b_lo = jnp.broadcast_to(lo, (P, 128))
        dims = (((1,), (1,)), ((), ()))
        out_hi = jax.lax.dot_general(
            sel_int, b_hi, dims, preferred_element_type=jnp.float32
        )
        out_lo = jax.lax.dot_general(
            sel_int, b_lo, dims, preferred_element_type=jnp.float32
        )
        return out_hi + out_lo                              # (64, P)

    def internal_step(col, sp, t_best, active):
        act = active > 0.0
        lox, loy, loz = col[0:8], col[8:16], col[16:24]
        hix, hiy, hiz = col[24:32], col[32:40], col[40:48]
        t0x = (lox - ox) * inv_x
        t1x = (hix - ox) * inv_x
        t0y = (loy - oy) * inv_y
        t1y = (hiy - oy) * inv_y
        t0z = (loz - oz) * inv_z
        t1z = (hiz - oz) * inv_z
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit8 = (
            (tn <= tf * 1.0001)
            & (tf > 0.0)
            & (tn < t_best)
            & (col[48:56] > 0.0)     # valid flags (sel_int rows 48:56)
            & act
        )
        any8 = jnp.any(hit8, axis=1, keepdims=True)          # (8, 1)
        bits = jnp.sum(jnp.where(any8, pow2, 0))             # scalar
        return bits

    def leaf_step(col, cnt, t_best, tri, b0, b1, verts, active):
        act = active > 0.0
        v = tuple(col[8 * k : 8 * k + 8] for k in range(9))  # p0..p2 xyz
        ids = col[72:80]
        # Translate to ray origin, permute to ray space.
        a0 = (v[0] - ox, v[1] - oy, v[2] - oz)
        a1 = (v[3] - ox, v[4] - oy, v[5] - oz)
        a2 = (v[6] - ox, v[7] - oy, v[8] - oz)
        q0 = _permute3(*a0, is0, is1)
        q1 = _permute3(*a1, is0, is1)
        q2 = _permute3(*a2, is0, is1)
        # Shear.
        x0 = q0[0] + sx * q0[2]
        y0 = q0[1] + sy * q0[2]
        x1 = q1[0] + sx * q1[2]
        y1 = q1[1] + sy * q1[2]
        x2 = q2[0] + sx * q2[2]
        y2 = q2[1] + sy * q2[2]
        # Signed edge functions (compensated, triangle.rs:229-260).
        e0 = difference_of_products(x1, y2, y1, x2)
        e1 = difference_of_products(x2, y0, y2, x0)
        e2 = difference_of_products(x0, y1, y0, x1)
        same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        )
        det = e0 + e1 + e2
        det_ok = det != 0.0
        z0 = q0[2] * sz
        z1 = q1[2] * sz
        z2 = q2[2] * sz
        ts = e0 * z0 + e1 * z1 + e2 * z2
        neg = det < 0.0
        # bool-select spelled as logic ops (Mosaic rejects i1 where()).
        t_ok = (neg & (ts <= 1e-7 * det) & (ts > t_best * det)) | (
            (~neg) & (ts >= 1e-7 * det) & (ts < t_best * det)
        )
        slot_ok = iota8 < cnt
        hit = same_sign & det_ok & t_ok & dz_ok & slot_ok & act
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        t = jnp.where(hit, ts * inv_det, jnp.inf)            # (8, P)
        tmin = jnp.min(t, axis=0, keepdims=True)             # (1, P)
        closer = tmin < t_best
        # First-min slot (XLA argmin tiebreak) without argmin lowering.
        cand = jnp.where(t == tmin, iota8, 8)
        sel = jnp.min(cand, axis=0, keepdims=True)
        oh = iota8 == sel                                     # (8, P)

        def pick(x):
            return jnp.sum(jnp.where(oh, x, 0.0), axis=0, keepdims=True)

        t_best = jnp.where(closer, tmin, t_best)
        tri = jnp.where(closer, pick(ids), tri)
        bb0 = pick(e0 * inv_det)
        bb1 = pick(e1 * inv_det)
        b0 = jnp.where(closer, bb0, b0)
        b1 = jnp.where(closer, bb1, b1)
        verts = tuple(
            jnp.where(closer, pick(vk), wk) for vk, wk in zip(v, verts)
        )
        active = jnp.where(want_any & closer, 0.0, active)
        return t_best, tri, b0, b1, verts, active, jnp.max(active)

    def body(c):
        sp, t_best, tri, b0, b1, verts, active, alive = c[:8]
        e = stack_ref[sp - 1]
        bits_e = e & 255
        lsb = bits_e & (-bits_e)
        # j = log2(lsb) for an 8-bit power of two: 3 mask tests.
        j = (
            jnp.where((lsb & 0xAA) != 0, 1, 0)
            + jnp.where((lsb & 0xCC) != 0, 2, 0)
            + jnp.where((lsb & 0xF0) != 0, 4, 0)
        )
        rest = e - lsb
        stack_ref[sp - 1] = rest
        sp = sp - jnp.where((rest & 255) == 0, 1, 0)
        r = (e >> 8) + j
        m = meta_ref[r]
        cnt = m & 15

        def do_internal(_):
            col = fetch_bf(r)
            bits = internal_step(col, sp, t_best, active)

            @pl.when(bits != 0)
            def _():
                stack_ref[sp] = ((m >> 4) << 8) | bits

            sp2 = sp + jnp.where(bits != 0, 1, 0)
            return sp2, t_best, tri, b0, b1, verts, active, alive

        def do_leaf(_):
            col = fetch(r)
            out = leaf_step(col, cnt, t_best, tri, b0, b1, verts, active)
            return (sp,) + out

        stepped = jax.lax.cond(cnt == 0, do_internal, do_leaf, None)
        return stepped + (c[8] + 1,)

    def cond(c):
        return (c[0] > 0) & (c[7] > 0.0)

    final = jax.lax.while_loop(cond, body, init + (jnp.int32(0),))
    _, t_best, tri, b0, b1, verts, _, _, n_steps = final
    steps_v = jnp.full((1, P), n_steps.astype(jnp.float32))
    out = jnp.concatenate(
        [t_best, tri, b0, b1] + list(verts) + [steps_v]
        + [jnp.zeros((_ROWS_OUT - 14, P), jnp.float32)],
        axis=0,
    )
    out_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("stack_size", "interpret")
)
def _traverse_call(meta, tab, tab_bf, rays, *, stack_size, interpret):
    g = rays.shape[0]
    kern = functools.partial(_traverse_kernel, stack_size=stack_size)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((g, _ROWS_OUT, P), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, _ROWS_IN, P), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                tab_bf.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS_OUT, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((stack_size,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TABLE_BYTES + 8 * 1024 * 1024,
        ),
    )(meta, rays, tab, tab_bf)


def traverse_packets(tris, ray_o, ray_d, t_max, any_hit=False,
                     interpret=False, return_steps=False):
    """Packet-traversal entry: same contract as
    shapes/triangle.py::_traverse (t, tri_idx, b0, b1, b2, verts).

    tris: TriangleSceneData (uses rows8 + meta).  any_hit: python bool or
    per-lane (N,) bool.  interpret: run the kernel interpreted (CPU CI).
    """
    n = ray_o.shape[0]
    g = max(1, -(-n // P))
    npad = g * P
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    want = jnp.broadcast_to(jnp.asarray(any_hit, bool), (n,))
    lanes = jnp.stack(
        [
            ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
            ray_d[:, 0], ray_d[:, 1], ray_d[:, 2],
            t_max, want.astype(jnp.float32),
        ],
        axis=0,
    )                                                     # (8, N)
    if npad != n:
        pad = jnp.zeros((_ROWS_IN, npad - n), jnp.float32)
        # padded lanes: t_max=0 -> inactive from the first step
        pad = pad.at[5].set(1.0)                          # d = +z
        lanes = jnp.concatenate([lanes, pad], axis=1)
    rays = jnp.transpose(lanes.reshape(_ROWS_IN, g, P), (1, 0, 2))

    out = _traverse_call(
        tris.meta, tris.rows8, tris.rows8_bf, rays,
        stack_size=int(tris.stack_depth) + 8,
        interpret=interpret,
    )                                                     # (g, 16, P)
    flat = jnp.transpose(out, (1, 0, 2)).reshape(_ROWS_OUT, npad)[:, :n]
    t_best = flat[0]
    tri = flat[1].astype(jnp.int32)
    b0, b1 = flat[2], flat[3]
    verts = jnp.transpose(flat[4:13], (1, 0))
    b2 = jnp.where(tri >= 0, 1.0 - b0 - b1, 0.0)
    t_best = jnp.where(tri >= 0, t_best, jnp.inf)
    if return_steps:
        return t_best, tri, b0, b1, b2, verts, flat[13]
    return t_best, tri, b0, b1, b2, verts
