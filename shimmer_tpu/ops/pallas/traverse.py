"""Pallas TPU packet-traversal kernel for the 8-wide BVH.

TPU-native replacement for the innermost hot loop of the reference
renderer (/root/reference/src/aggregate.rs:71-139 BvhAggregate::intersect
+ src/shape/triangle.rs:173-302 watertight intersect), designed from the
measured hardware constraints rather than translated:

* Per-lane divergent row gathers are the XLA path's bottleneck: the TPU
  has no vector-indexed load, so an (N,)-indexed gather from HBM costs
  ~0.4 ms per traversal step at 131k lanes.
* Inside one kernel a *scalar*-indexed node fetch from a VMEM-resident
  table is cheap, and the VPU tests that node's 8 child boxes (or 8
  leaf triangles) against 128 rays as one (8, 128) vreg tile.

So the kernel traverses in *packets*: 128 rays share one traversal
stack (classic packet tracing) and every popped node is tested against
all lanes at once.  The design is driven by three on-chip measurements
(experiments/exp_ablate_step.py, exp_overhead2.py):

1. The scalar pop/push chain is ~6 ns/step; ALL the cost is in the
   vector work and its latency.  Stack entries pack ``base<<8 | bits``
   so a pop is a lowest-set-bit peel and a push one scalar store.
2. Any MXU-transpose node fetch costs ~200 ns of unhidden latency per
   step.  The node table is therefore stored pre-transposed:
   ``ops/bvh8.py::pack_tiles8`` packs 8 nodes per (8, 128) f32 tile,
   slot j on sublane j, node r's fields on lanes ``16*(r&7)+c``; a
   visit is a tile-aligned VMEM load + one dynamic lane roll + static
   lane broadcasts — pure VPU, exact f32.
3. A single traversal chain is latency-bound (~290 ns/visit); four
   independent chains in the same loop body pipeline substantially
   better, so the kernel interleaves K=4 packets per grid step, each
   with its own stack/bitmask state, sharing the while loop.  With the
   full (slab + watertight-leaf) body the measured production cost is
   ~250 ns per chain-step — issue-bound on ~160 vector ops/step; the
   r5 variant sweep (experiments/r5_kernel_ab.py) found structural
   changes (dual-stack leaf overlap, tn-ordered pops — kernel v2 below)
   trade steps against per-step cost near break-even and ~7% behind on
   the production wave, so this v1 form stays the default.

**Leaf-test formulation (SHIMMER_LEAF_MT).**  The default leaf body is
pbrt's watertight translate-permute-shear intersect.  Setting
SHIMMER_LEAF_MT=1 switches leaf tiles to (p0, e1, e2) packing and the
kernel to Moller-Trumbore with pack-time edges (~30 fewer vector ops
per unified chain-step).  Measured on-chip (experiments/r5_mt_ab.py,
r5_mt_wave_ab.py): raw coherent primaries +16% (7.15 vs 6.17 Mrays/s),
raw incoherent bounces -1% (noise), production wave +0.4% (noise), hit
agreement 1.000000 on the bench scene.  Watertight stays the default:
the production wave's ray mix sees no win, so there is no reason to
give up the shared-edge watertight guarantee; the MT flag is for
coherent primary-visibility workloads (AO/baking-style batches).

Traversal state stays minimal — per packet only (t_best, tri, active)
vectors — and the winner's vertices/barycentrics are re-derived OUTSIDE
the kernel by re-running the same watertight intersection on the
winning triangle (one (N,) gather + vectorized math), which keeps vreg
pressure low enough for the interleave to pipeline.

The node-tile table (HBM->VMEM) and meta array (HBM->SMEM) are copied
ONCE on the first grid step into persistent scratch: passing them as
grid-blocked operands re-copies them every grid step (measured
7.1 us/packet for the 71 KB meta SMEM operand alone).

**HBM streaming (Ganesha-scale scenes).**  When the tile table exceeds
the VMEM budget, only the first ``n_res`` tiles stay resident — the row
allocation is BFS (ops/bvh8.py::_layout8), so residency = the top of
the tree, exactly the rows every packet shares; deep rows are cold and
divergent.  A visit to a non-resident row DMAs its (8, 128) tile from
HBM into a per-chain slot: each loop iteration first issues the DMA
*starts* for all K interleaved chains, then does the K compute
sections, each waiting only on its own copy — so one chain's HBM
latency overlaps the other chains' VPU work.  Small scenes compile the
exact non-streaming kernel (the ``stream`` flag is static).  This
removes the old ~220k-triangle ceiling: any scene whose *top* 48 MB of
BFS rows covers the hot set runs the fast path
(/root/reference/src/aggregate.rs:207-467 handles multi-M tris on CPU;
this is the TPU answer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shimmer_tpu.ops.bvh8 import LEAF_MT
from shimmer_tpu.ops.math import difference_of_products

import os

P = 128                      # rays per packet (one vreg lane dim)
# Interleaved packets per grid step (env knob for on-chip tuning).
# Default 4: r4 on-chip sweep measured (131k bounce rays, 327k tris)
# K=2: 5.55, K=4: 6.93, K=8: 7.16 Mrays/s raw — 4 is the knee; 8 adds
# VMEM/SMEM pressure for ~3%.
K_PACKETS = int(os.environ.get("SHIMMER_KPACKETS", "4"))
# Packet groups per grid step (v2): amortizes fixed grid-step overhead.
TRAVERSE_GROUPS = int(os.environ.get("SHIMMER_GROUPS", "2"))
# Input rows per packet.  Everything loop-invariant is precomputed by
# XLA at pack time and handed to the kernel as extra rows — the kernel
# loop then contains no divides and no shear/permute setup:
#   0-2 o, 3-5 d, 6 tmax, 7 any-hit flag,
#   8-10 1/d (guarded), 11-13 watertight shear sx sy sz,
#   14 permute code (0/1/2 = |d|-max axis), 15 dz_ok flag
_ROWS_IN = 16
_ROWS_OUT = 8                # t, tri, steps, pad
# VMEM budget for the node table (v5e has 128 MB VMEM; leave headroom
# for ray/out blocks and the far-tile slots).  Scenes beyond the budget
# stream their cold rows from HBM per visit.
VMEM_TABLE_BYTES = int(os.environ.get("SHIMMER_VMEM_MB", "110")) * 1024 * 1024


def _permute3(x, y, z, is0, is1):
    """Cyclic permute so the ray's |d|-max axis lands in z (see
    shapes/triangle.py::_permute_to_max_z — pure selects, no gathers)."""
    ox = jnp.where(is0, y, jnp.where(is1, z, x))
    oy = jnp.where(is0, z, jnp.where(is1, x, y))
    oz = jnp.where(is0, x, jnp.where(is1, y, z))
    return ox, oy, oz


def _traverse_kernel(meta_hbm_ref, rays_ref, tab_hbm_ref, out_ref,
                     stack_ref, tab_ref, meta_ref, tab_sem, meta_sem,
                     far_ref, far_sem,
                     *, stack_size, k_packets, n_rows, n_res, stream):
    K = k_packets
    n_res_rows = n_res * 8

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Resident prefix only: BFS row order puts the hot top-of-tree
        # first; the rest streams per-visit (see module docstring).
        # Whole-ref copies when everything fits (prefix slices must be
        # tiling-aligned, which _traverse_call guarantees for stream).
        if stream:
            tab_copy = pltpu.make_async_copy(
                tab_hbm_ref.at[pl.ds(0, n_res)], tab_ref, tab_sem
            )
            meta_copy = pltpu.make_async_copy(
                meta_hbm_ref.at[pl.ds(0, n_res_rows)], meta_ref, meta_sem
            )
        else:
            tab_copy = pltpu.make_async_copy(tab_hbm_ref, tab_ref, tab_sem)
            meta_copy = pltpu.make_async_copy(
                meta_hbm_ref, meta_ref, meta_sem
            )
        tab_copy.start()
        meta_copy.start()
        tab_copy.wait()
        meta_copy.wait()

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    pow2 = (1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))

    def fetch(r):
        """One node: aligned (8,128) VMEM tile load + dynamic lane roll
        so node r's 16 field lanes land at 0..15 (slot j on sublane j)."""
        tile = tab_ref[r >> 3]                              # (8, 128)
        return pltpu.roll(tile, (128 - ((r & 7) << 4)) & 127, axis=1)

    def fld(tile, c):
        """Broadcast field c (lane c) across all P ray lanes."""
        return jnp.broadcast_to(tile[:, c : c + 1], (8, P))

    # Per-packet ray registers (read fresh from the VMEM block each use;
    # cheap reloads beat carrying loop-invariant vregs per packet).
    # Rows 8+ hold invariants precomputed at pack time (see _ROWS_IN).
    def ray_of(k):
        rays = rays_ref[:, k * P:(k + 1) * P]   # (16, P)
        return (rays[0:1], rays[1:2], rays[2:3],
                rays[3:4], rays[4:5], rays[5:6],
                rays[6:7], rays[7:8] > 0.0)

    def inv_of(k):
        rays = rays_ref[:, k * P:(k + 1) * P]
        return rays[8:9], rays[9:10], rays[10:11]

    def shear_of(k):
        """Watertight translate-permute-shear invariants
        (triangle.rs:173-228) — precomputed at pack time with formulas
        identical to shapes/triangle.py::intersect_triangle so the
        caller's re-intersection reproduces the kernel's hit decision."""
        rays = rays_ref[:, k * P:(k + 1) * P]
        pc = rays[14:15]
        return (pc < 0.5, (pc >= 0.5) & (pc < 1.5),
                rays[11:12], rays[12:13], rays[13:14], rays[15:16] > 0.0)

    t_bests, actives = [], []
    for k in range(K):
        *_, t_max, _want = ray_of(k)
        stack_ref[k, 0] = 1                   # root group: base 0, bit 0
        a0 = (t_max > 0.0).astype(jnp.float32)
        t_bests.append(t_max)
        actives.append(a0)

    def internal_step(k, tile, t_best, active):
        ox, oy, oz, *_ = ray_of(k)
        inv_x, inv_y, inv_z = inv_of(k)
        t0x = (fld(tile, 0) - ox) * inv_x
        t1x = (fld(tile, 3) - ox) * inv_x
        t0y = (fld(tile, 1) - oy) * inv_y
        t1y = (fld(tile, 4) - oy) * inv_y
        t0z = (fld(tile, 2) - oz) * inv_z
        t1z = (fld(tile, 5) - oz) * inv_z
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
            & (fld(tile, 6) > 0.0)            # slot-valid flags
            & (active > 0.0)
        )
        any8 = jnp.any(hit8, axis=1, keepdims=True)          # (8, 1)
        return jnp.sum(jnp.where(any8, pow2, 0))             # scalar bits

    def leaf_step(k, tile, cnt, t_best, tri, active, live):
        ox, oy, oz, dx, dy, dz, _tm, want_any = ray_of(k)
        ids = fld(tile, 9)
        if LEAF_MT:
            # Moller-Trumbore with pack-time edges (bvh8.py LEAF_MT):
            # leaf lanes hold (p0, e1, e2).  Saves the 9 translate subs,
            # 18 permutation selects, and 6 shear fmas of the watertight
            # body (~30 vector ops of the ~160/step budget) at the cost
            # of pbrt's shared-edge watertight guarantee — opt-in.
            p0x, p0y, p0z = fld(tile, 0), fld(tile, 1), fld(tile, 2)
            e1x, e1y, e1z = fld(tile, 3), fld(tile, 4), fld(tile, 5)
            e2x, e2y, e2z = fld(tile, 6), fld(tile, 7), fld(tile, 8)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            u_s = tvx * pvx + tvy * pvy + tvz * pvz
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v_s = dx * qvx + dy * qvy + dz * qvz
            ts = e2x * qvx + e2y * qvy + e2z * qvz
            w_s = det - u_s - v_s
            same_sign = ((u_s >= 0) & (v_s >= 0) & (w_s >= 0)) | (
                (u_s <= 0) & (v_s <= 0) & (w_s <= 0)
            )
            det_ok = det != 0.0
            geom_ok = same_sign & det_ok
        else:
            is0, is1, sx, sy, sz, dz_ok = shear_of(k)
            v = tuple(fld(tile, c) for c in range(9))        # p0..p2 xyz
            a0 = (v[0] - ox, v[1] - oy, v[2] - oz)
            a1 = (v[3] - ox, v[4] - oy, v[5] - oz)
            a2 = (v[6] - ox, v[7] - oy, v[8] - oz)
            q0 = _permute3(*a0, is0, is1)
            q1 = _permute3(*a1, is0, is1)
            q2 = _permute3(*a2, is0, is1)
            x0 = q0[0] + sx * q0[2]
            y0 = q0[1] + sy * q0[2]
            x1 = q1[0] + sx * q1[2]
            y1 = q1[1] + sy * q1[2]
            x2 = q2[0] + sx * q2[2]
            y2 = q2[1] + sy * q2[2]
            e0 = difference_of_products(x1, y2, y1, x2)
            e1 = difference_of_products(x2, y0, y2, x0)
            e2 = difference_of_products(x0, y1, y0, x1)
            same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
                (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
            )
            det = e0 + e1 + e2
            det_ok = det != 0.0
            ts = e0 * (q0[2] * sz) + e1 * (q1[2] * sz) + e2 * (q2[2] * sz)
            geom_ok = same_sign & det_ok & dz_ok
        neg = det < 0.0
        # bool-select spelled as logic ops (Mosaic rejects i1 where()).
        t_ok = (neg & (ts <= 1e-7 * det) & (ts > t_best * det)) | (
            (~neg) & (ts >= 1e-7 * det) & (ts < t_best * det)
        )
        slot_ok = iota8 < cnt
        hit = geom_ok & t_ok & slot_ok & (active > 0.0) & live
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        t = jnp.where(hit, ts * inv_det, jnp.inf)            # (8, P)
        tmin = jnp.min(t, axis=0, keepdims=True)             # (1, P)
        closer = tmin < t_best
        # Winner-id selection.  The min-reduce form (SHIMMER_WINID_MIN=1)
        # is 4 fewer vector ops but measured SLOWER on-chip (r5_winid_ab
        # ABAB: raw primary 6.9 vs 7.15, wave 1.572 vs 1.590 Mrays/s) —
        # Mosaic schedules the iota dance better than the where+min
        # chain, so op count alone does not decide here.  Iota default.
        if WINID_MIN:
            win_id = jnp.min(
                jnp.where(t == tmin, ids, jnp.inf), axis=0, keepdims=True
            )
        else:
            cand = jnp.where(t == tmin, iota8, 8)
            sel = jnp.min(cand, axis=0, keepdims=True)
            oh = iota8 == sel
            win_id = jnp.sum(
                jnp.where(oh, ids, 0.0), axis=0, keepdims=True
            )
        t_best = jnp.where(closer, tmin, t_best)
        tri = jnp.where(closer, win_id, tri)
        active = jnp.where(want_any & closer, 0.0, active)
        return t_best, tri, active

    def body(c):
        sps, t_bs, tris_, acts, caches, ns = c
        sps_n = list(sps)
        t_n = list(t_bs)
        tri_n = list(tris_)
        act_n = list(acts)
        cache_n = list(caches)
        # BRANCH-FREE unified step per packet: no lax.cond / pl.when —
        # each cond is a basic-block boundary that stops Mosaic from
        # pipelining the K independent chains (measured: cond-based
        # interleave was SLOWER than one packet).  The leaf test is
        # self-masking (slot_ok = iota8 < cnt is empty on internal
        # rows); internal bits are scalar-gated; stack writes are
        # predicated with scalar selects into harmless slots.
        #
        # Streaming mode adds a pop + DMA-start pass over all K chains
        # BEFORE any compute, so a non-resident row's HBM latency
        # overlaps the other chains' VPU work (pl.when blocks here cost
        # pipelining — only compiled when the scene outgrows VMEM).
        pops = []
        for k in range(K):
            sp = sps[k]
            live = sp > 0
            idx = jnp.maximum(sp - 1, 0)
            e = stack_ref[k, idx]
            bits_e = e & 255
            lsb = bits_e & (-bits_e)
            j = (
                jnp.where((lsb & 0xAA) != 0, 1, 0)
                + jnp.where((lsb & 0xCC) != 0, 2, 0)
                + jnp.where((lsb & 0xF0) != 0, 4, 0)
            )
            rest = e - lsb
            # Predicated pop: dead packets rewrite the entry unchanged.
            stack_ref[k, idx] = jnp.where(live, rest, e)
            sp_p = sp - jnp.where((rest & 255) == 0, 1, 0)
            r = jnp.clip((e >> 8) + j, 0, n_rows - 1)
            far = live & (r >= n_res_rows) if stream else None
            need = None
            if stream:
                # Per-chain last-tile cache: sibling rows are contiguous
                # (children base..base+7 usually share one 8-row tile),
                # so consecutive far pops often want the tile already in
                # far_ref[k] — skip the DMA when the index matches.
                tidx = r >> 3
                need = far & (tidx != caches[k])

                @pl.when(need)
                def _(k=k, tidx=tidx):
                    pltpu.make_async_copy(
                        tab_hbm_ref.at[tidx], far_ref.at[k],
                        far_sem.at[k],
                    ).start()

                cache_n[k] = jnp.where(far, tidx, caches[k])
            pops.append((sp, sp_p, r, live, far, need))

        for k in range(K):
            sp, sp_p, r, live, far, need = pops[k]
            if stream:

                @pl.when(need)
                def _(k=k, r=r):
                    pltpu.make_async_copy(
                        tab_hbm_ref.at[r >> 3], far_ref.at[k],
                        far_sem.at[k],
                    ).wait()

                tile_res = tab_ref[jnp.minimum(r >> 3, n_res - 1)]
                tile = jnp.where(far, far_ref[k][:, :], tile_res)
                col = pltpu.roll(tile, (128 - ((r & 7) << 4)) & 127, axis=1)
                # Meta for streamed rows rides in the tile itself
                # (pack_tiles8 field c10, exact small float).
                m_far = col[0, 10].astype(jnp.int32)
                m = jnp.where(
                    far, m_far, meta_ref[jnp.minimum(r, n_res_rows - 1)]
                )
            else:
                m = meta_ref[r]
                col = fetch(r)
            cnt = m & 15

            is_int = live & (cnt == 0)
            bits = internal_step(k, col, t_bs[k], acts[k])
            bits_eff = jnp.where(is_int, bits, 0)
            # Unconditional push store: slot sp_p is the first free slot
            # (only ever popped after a later push overwrites it), so
            # writing there is harmless when no push happens.
            slot = jnp.clip(sp_p, 0, stack_size - 1)
            stack_ref[k, slot] = jnp.where(
                bits_eff != 0,
                ((m >> 4) << 8) | bits_eff,
                stack_ref[k, slot],
            )
            sp2 = sp_p + jnp.where(bits_eff != 0, 1, 0)
            sps_n[k] = jnp.where(live, sp2, sp)

            tb, tr, ac = leaf_step(
                k, col, cnt, t_bs[k], tris_[k], acts[k], live
            )
            t_n[k] = tb
            tri_n[k] = tr
            act_n[k] = ac
        return (tuple(sps_n), tuple(t_n), tuple(tri_n), tuple(act_n),
                tuple(cache_n), ns + 1)

    def cond(c):
        # sp-only: an any-hit packet whose lanes all terminated simply
        # drains its remaining stack (<= depth entries, no new pushes
        # since every hit test is masked by active) — cheaper than a
        # per-step cross-lane alive reduction.
        sps = c[0]
        live = sps[0] > 0
        for k in range(1, K):
            live = live | (sps[k] > 0)
        return live

    init = (
        tuple(
            jnp.where(jnp.max(actives[k]) > 0.0, 1, 0) for k in range(K)
        ),
        tuple(t_bests),
        tuple(jnp.full((1, P), -1.0, jnp.float32) for _ in range(K)),
        tuple(actives),
        tuple(jnp.int32(-1) for _ in range(K)),
        jnp.int32(0),
    )
    sps, t_bs, tris_, _, _, n_steps = jax.lax.while_loop(cond, body, init)
    steps_v = jnp.full((1, P), n_steps.astype(jnp.float32))
    zero_pad = jnp.zeros((_ROWS_OUT - 3, P), jnp.float32)
    for k in range(K):
        out_ref[:, k * P:(k + 1) * P] = jnp.concatenate(
            [t_bs[k], tris_[k], steps_v, zero_pad], axis=0
        )


LEAF_STACK = 32           # v2 leaf-backlog entries per chain


ORDERED_POP = os.environ.get("SHIMMER_ORDERED", "1") == "1"


UNIFIED = os.environ.get("SHIMMER_UNIFIED", "1") == "1"


def _traverse_kernel_v2(meta_hbm_ref, rays_ref, tab_hbm_ref, out_ref,
                        istack0_ref, istack1_ref, lstack_ref,
                        tab_ref, meta_ref, tab_sem, meta_sem,
                        far_ref, far_sem,
                        *, stack_size, k_packets, n_rows, n_res, stream, groups,
                        ordered=ORDERED_POP, unified=UNIFIED):
    """Ordered dual-stack packet traversal (r5 redesign).

    Two structural changes over ``_traverse_kernel``, both sized by the
    host simulation (experiments/r5_split_sim.py):

    1. **Near-first ordered pops.**  Internal children are pushed as one
       (base<<4 | n, packed 3-bit order) entry pair, ranked by each
       child's minimum slab entry distance over the packet's live lanes.
       Closest-hit t_best tightens far sooner, shrinking the visit
       union 2.4x on incoherent bounce packets (sim: 607 → 230 rows).

    2. **Leaf/internal overlap.**  Visits split ~45% leaf / 55% internal
       and the old branch-free body paid BOTH the slab test and the
       full watertight leaf test on every visit.  Here each loop step
       pops one INTERNAL row and one LEAF row (separate stacks), so a
       step retires two visits for one leaf-test + one slab-test —
       steps = max(int, leaf) instead of int + leaf (~1.8x).  Leaf
       children go to a bitmask backlog popped leaf-first; when the
       backlog nears capacity the internal pop pauses (backpressure
       bounds the backlog at LEAF_STACK entries).

    Entry formats: internal stack e0 = child_base<<4 | n_remaining,
    e1 = concatenated 3-bit child indices in ascending-tn order; leaf
    backlog = base<<8 | bitmask (lsb-pop, like v1 entries).
    """
    K = k_packets
    n_res_rows = n_res * 8

    @pl.when(pl.program_id(0) == 0)
    def _():
        if stream:
            tab_copy = pltpu.make_async_copy(
                tab_hbm_ref.at[pl.ds(0, n_res)], tab_ref, tab_sem
            )
            meta_copy = pltpu.make_async_copy(
                meta_hbm_ref.at[pl.ds(0, n_res_rows)], meta_ref, meta_sem
            )
        else:
            tab_copy = pltpu.make_async_copy(tab_hbm_ref, tab_ref, tab_sem)
            meta_copy = pltpu.make_async_copy(
                meta_hbm_ref, meta_ref, meta_sem
            )
        tab_copy.start()
        meta_copy.start()
        tab_copy.wait()
        meta_copy.wait()

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def fetch(r):
        tile = tab_ref[r >> 3]
        return pltpu.roll(tile, (128 - ((r & 7) << 4)) & 127, axis=1)

    def fld(tile, c):
        return jnp.broadcast_to(tile[:, c : c + 1], (8, P))

    # Several packet groups per grid step amortize the fixed
    # per-grid-step cost (~20 us: block copies + program setup —
    # measured 10.8 ms for 512 all-dead steps at 262k lanes).
    for g_i in range(groups):
        goff = g_i * K * P
        def ray_of(k):
            rays = rays_ref[:, goff + k * P:goff + (k + 1) * P]
            return (rays[0:1], rays[1:2], rays[2:3],
                    rays[3:4], rays[4:5], rays[5:6],
                    rays[6:7], rays[7:8] > 0.0)

        def inv_of(k):
            rays = rays_ref[:, goff + k * P:goff + (k + 1) * P]
            return rays[8:9], rays[9:10], rays[10:11]

        def shear_of(k):
            rays = rays_ref[:, goff + k * P:goff + (k + 1) * P]
            pc = rays[14:15]
            return (pc < 0.5, (pc >= 0.5) & (pc < 1.5),
                    rays[11:12], rays[12:13], rays[13:14], rays[15:16] > 0.0)

        t_bests, actives = [], []
        for k in range(K):
            *_, t_max, _want = ray_of(k)
            a0 = (t_max > 0.0).astype(jnp.float32)
            t_bests.append(t_max)
            actives.append(a0)

        # Root row 0 may itself be a leaf (tiny scenes): route the initial
        # entry to the matching stack at runtime.
        root_entry = (0 << 4) | 1 if ordered else (0 << 8) | 1
        if unified:
            # One stack: the root pops through the normal path whatever its
            # kind (leaf rows self-mask in internal_step via cnt == 0).
            for k in range(K):
                istack0_ref[k, 0] = root_entry
                istack1_ref[k, 0] = 0
                lstack_ref[k, 0] = 0
            sp0 = jnp.int32(1)
            lsp0 = jnp.int32(0)
        else:
            root_is_leaf = (meta_ref[0] & 15) > 0
            for k in range(K):
                istack0_ref[k, 0] = jnp.where(root_is_leaf, 0, root_entry)
                istack1_ref[k, 0] = 0
                lstack_ref[k, 0] = jnp.where(root_is_leaf, 1, 0)
            sp0 = jnp.where(root_is_leaf, 0, 1)
            lsp0 = jnp.where(root_is_leaf, 1, 0)

        def internal_step(k, tile, t_best, active, live):
            """Slab test → (any8 (8,1) bool, tn_min (8,1))."""
            ox, oy, oz, *_ = ray_of(k)
            inv_x, inv_y, inv_z = inv_of(k)
            t0x = (fld(tile, 0) - ox) * inv_x
            t1x = (fld(tile, 3) - ox) * inv_x
            t0y = (fld(tile, 1) - oy) * inv_y
            t1y = (fld(tile, 4) - oy) * inv_y
            t0z = (fld(tile, 2) - oz) * inv_z
            t1z = (fld(tile, 5) - oz) * inv_z
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
                & (fld(tile, 6) > 0.0)
                & (active > 0.0)
                & live
            )
            any8 = jnp.any(hit8, axis=1, keepdims=True)          # (8, 1)
            tnm = jnp.min(
                jnp.where(hit8, tn, jnp.float32(3.0e38)), axis=1, keepdims=True
            )
            return any8, tnm

        def rank_order(any_int, tnm):
            """Packed ascending-tn order of the set children in ``any_int``
            ((8,1) bool): 3-bit child indices concatenated rank-major.
            Rank via 7 sublane rolls with static index tie-breaks — a
            stable-sort permutation, so ranks are unique even on ties."""
            key = jnp.where(any_int, tnm, jnp.float32(3.4e38))
            rank = jnp.zeros((8, 1), jnp.int32)
            for s in range(1, 8):
                other = pltpu.roll(key, s, axis=0)     # lane i: key[(i-s)%8]
                j_col = (iota_col - s) & 7
                tie = (other == key) & (j_col < iota_col)
                rank = rank + jnp.where((other < key) | tie, 1, 0)
            packed = jnp.where(any_int, iota_col << (3 * rank), 0)
            return jnp.sum(packed)                      # scalar

        def leaf_step(k, tile, cnt, t_best, tri, active, live):
            ox, oy, oz, dx, dy, dz, _tm, want_any = ray_of(k)
            is0, is1, sx, sy, sz, dz_ok = shear_of(k)
            v = tuple(fld(tile, c) for c in range(9))
            ids = fld(tile, 9)
            a0 = (v[0] - ox, v[1] - oy, v[2] - oz)
            a1 = (v[3] - ox, v[4] - oy, v[5] - oz)
            a2 = (v[6] - ox, v[7] - oy, v[8] - oz)
            q0 = _permute3(*a0, is0, is1)
            q1 = _permute3(*a1, is0, is1)
            q2 = _permute3(*a2, is0, is1)
            x0 = q0[0] + sx * q0[2]
            y0 = q0[1] + sy * q0[2]
            x1 = q1[0] + sx * q1[2]
            y1 = q1[1] + sy * q1[2]
            x2 = q2[0] + sx * q2[2]
            y2 = q2[1] + sy * q2[2]
            e0 = difference_of_products(x1, y2, y1, x2)
            e1 = difference_of_products(x2, y0, y2, x0)
            e2 = difference_of_products(x0, y1, y0, x1)
            same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
                (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
            )
            det = e0 + e1 + e2
            det_ok = det != 0.0
            ts = e0 * (q0[2] * sz) + e1 * (q1[2] * sz) + e2 * (q2[2] * sz)
            neg = det < 0.0
            t_ok = (neg & (ts <= 1e-7 * det) & (ts > t_best * det)) | (
                (~neg) & (ts >= 1e-7 * det) & (ts < t_best * det)
            )
            slot_ok = iota8 < cnt
            hit = (
                same_sign & det_ok & t_ok & dz_ok & slot_ok
                & (active > 0.0) & live
            )
            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
            t = jnp.where(hit, ts * inv_det, jnp.inf)
            tmin = jnp.min(t, axis=0, keepdims=True)
            closer = tmin < t_best
            cand = jnp.where(t == tmin, iota8, 8)
            sel = jnp.min(cand, axis=0, keepdims=True)
            oh = iota8 == sel
            win_id = jnp.sum(jnp.where(oh, ids, 0.0), axis=0, keepdims=True)
            t_best = jnp.where(closer, tmin, t_best)
            tri = jnp.where(closer, win_id, tri)
            active = jnp.where(want_any & closer, 0.0, active)
            return t_best, tri, active

        def body(c):
            sps, lsps, t_bs, tris_, acts, ns = c
            sps_n = list(sps)
            lsps_n = list(lsps)
            t_n = list(t_bs)
            tri_n = list(tris_)
            act_n = list(acts)

            pops = []
            for k in range(K):
                lsp = lsps[k]
                if unified:
                    l_live = jnp.bool_(False)
                    lsp_p = lsp
                    r_l = jnp.int32(0)
                    bp = False
                else:
                    # --- leaf pop (bitmask backlog, lsb peel) ---
                    l_live = lsp > 0
                    lidx = jnp.maximum(lsp - 1, 0)
                    le = lstack_ref[k, lidx]
                    lbits = le & 255
                    llsb = lbits & (-lbits)
                    lj = (
                        jnp.where((llsb & 0xAA) != 0, 1, 0)
                        + jnp.where((llsb & 0xCC) != 0, 2, 0)
                        + jnp.where((llsb & 0xF0) != 0, 4, 0)
                    )
                    lrest = le - llsb
                    lstack_ref[k, lidx] = jnp.where(l_live, lrest, le)
                    lsp_p = lsp - jnp.where(
                        l_live & ((lrest & 255) == 0), 1, 0
                    )
                    r_l = jnp.clip((le >> 8) + lj, 0, n_rows - 1)
                    bp = lsp >= LEAF_STACK - 2

                # --- internal pop (ordered entry; backpressure pause) ---
                sp = sps[k]
                i_live = (sp > 0) & ~bp
                iidx = jnp.maximum(sp - 1, 0)
                e0 = istack0_ref[k, iidx]
                if ordered:
                    e1 = istack1_ref[k, iidx]
                    n_rem = e0 & 15
                    ij = e1 & 7
                    istack0_ref[k, iidx] = jnp.where(i_live, e0 - 1, e0)
                    istack1_ref[k, iidx] = jnp.where(i_live, e1 >> 3, e1)
                    sp_p = sp - jnp.where(i_live & (n_rem == 1), 1, 0)
                    r_i = jnp.clip((e0 >> 4) + ij, 0, n_rows - 1)
                else:
                    ibits = e0 & 255
                    ilsb = ibits & (-ibits)
                    ij = (
                        jnp.where((ilsb & 0xAA) != 0, 1, 0)
                        + jnp.where((ilsb & 0xCC) != 0, 2, 0)
                        + jnp.where((ilsb & 0xF0) != 0, 4, 0)
                    )
                    irest = e0 - ilsb
                    istack0_ref[k, iidx] = jnp.where(i_live, irest, e0)
                    sp_p = sp - jnp.where(
                        i_live & ((irest & 255) == 0), 1, 0
                    )
                    r_i = jnp.clip((e0 >> 8) + ij, 0, n_rows - 1)

                if stream:
                    far_i = i_live & (r_i >= n_res_rows)
                    far_l = (
                        jnp.bool_(False)
                        if unified
                        else l_live & (r_l >= n_res_rows)
                    )

                    @pl.when(far_i)
                    def _(k=k, r_i=r_i):
                        pltpu.make_async_copy(
                            tab_hbm_ref.at[r_i >> 3], far_ref.at[k, 0],
                            far_sem.at[k, 0],
                        ).start()

                    if not unified:

                        @pl.when(far_l)
                        def _(k=k, r_l=r_l):
                            pltpu.make_async_copy(
                                tab_hbm_ref.at[r_l >> 3], far_ref.at[k, 1],
                                far_sem.at[k, 1],
                            ).start()
                else:
                    far_i = far_l = None
                pops.append(
                    (sp_p, lsp_p, r_i, r_l, i_live, l_live, far_i, far_l)
                )

            for k in range(K):
                sp_p, lsp_p, r_i, r_l, i_live, l_live, far_i, far_l = pops[k]
                if stream:

                    @pl.when(far_i)
                    def _(k=k, r_i=r_i):
                        pltpu.make_async_copy(
                            tab_hbm_ref.at[r_i >> 3], far_ref.at[k, 0],
                            far_sem.at[k, 0],
                        ).wait()

                    if not unified:

                        @pl.when(far_l)
                        def _(k=k, r_l=r_l):
                            pltpu.make_async_copy(
                                tab_hbm_ref.at[r_l >> 3], far_ref.at[k, 1],
                                far_sem.at[k, 1],
                            ).wait()

                    tile_i_res = tab_ref[jnp.minimum(r_i >> 3, n_res - 1)]
                    tile_i = jnp.where(far_i, far_ref[k, 0][:, :], tile_i_res)
                    col_i = pltpu.roll(
                        tile_i, (128 - ((r_i & 7) << 4)) & 127, axis=1
                    )
                    m_i = jnp.where(
                        far_i,
                        col_i[0, 10].astype(jnp.int32),
                        meta_ref[jnp.minimum(r_i, n_res_rows - 1)],
                    )
                    if unified:
                        col_l, m_l = col_i, m_i
                    else:
                        tile_l_res = tab_ref[jnp.minimum(r_l >> 3, n_res - 1)]
                        tile_l = jnp.where(
                            far_l, far_ref[k, 1][:, :], tile_l_res
                        )
                        col_l = pltpu.roll(
                            tile_l, (128 - ((r_l & 7) << 4)) & 127, axis=1
                        )
                        m_l = jnp.where(
                            far_l,
                            col_l[0, 10].astype(jnp.int32),
                            meta_ref[jnp.minimum(r_l, n_res_rows - 1)],
                        )
                else:
                    col_i = fetch(r_i)
                    m_i = meta_ref[r_i]
                    if unified:
                        col_l, m_l = col_i, m_i
                    else:
                        col_l = fetch(r_l)
                        m_l = meta_ref[r_l]

                if unified:
                    # v1-style single visit: the popped row self-selects —
                    # internal work masked to cnt==0 rows, leaf work
                    # self-masks via slot_ok (iota8 < cnt).
                    int_live = i_live & ((m_i & 15) == 0)
                    leaf_live = i_live
                else:
                    int_live = i_live
                    leaf_live = l_live
                any8, tnm = internal_step(
                    k, col_i, t_bs[k], acts[k], int_live
                )
                if unified:
                    any_int = any8
                    any_leaf = jnp.zeros((8, 1), bool)
                else:
                    # c11 replicates the child-leaf mask across all 8
                    # sublanes (pack_tiles8), so the per-slot leaf test
                    # stays in vector land — no vreg element extraction.
                    leaf_vec = col_i[:, 11:12].astype(jnp.int32)   # (8,1)
                    leaf_col = ((leaf_vec >> iota_col) & 1) > 0    # (8,1)
                    any_int = any8 & ~leaf_col
                    any_leaf = any8 & leaf_col
                # ONE combined vector->scalar reduction for the leaf bits and
                # the internal count/bits (each sync of the scalar pipe on
                # vector results costs ~100 cycles; v2's first cut paid five
                # per chain-step and ran 1.7x slower than v1 per step).
                child_base = m_i >> 4
                if ordered:
                    combo = jnp.sum(
                        jnp.where(any_leaf, 1 << iota_col, 0)
                        + jnp.where(any_int, 256, 0)
                    )
                    bits_leaf = combo & 255
                    n_int = combo >> 8
                    order = rank_order(any_int, tnm)
                    push_int = i_live & (n_int != 0)
                    ie_new = (child_base << 4) | n_int
                else:
                    combo = jnp.sum(
                        jnp.where(any_leaf, 1 << iota_col, 0)
                        + jnp.where(any_int, 256 << iota_col, 0)
                    )
                    bits_leaf = combo & 255
                    bits_int = combo >> 8
                    push_int = i_live & (bits_int != 0)
                    ie_new = (child_base << 8) | bits_int

                islot = jnp.clip(sp_p, 0, stack_size - 1)
                istack0_ref[k, islot] = jnp.where(
                    push_int, ie_new, istack0_ref[k, islot]
                )
                if ordered:
                    istack1_ref[k, islot] = jnp.where(
                        push_int, order, istack1_ref[k, islot]
                    )
                sp2 = sp_p + jnp.where(push_int, 1, 0)
                sps_n[k] = sp2

                if unified:
                    lsps_n[k] = lsp
                else:
                    push_leaf = i_live & (bits_leaf != 0)
                    lslot = jnp.clip(lsp_p, 0, LEAF_STACK - 1)
                    lstack_ref[k, lslot] = jnp.where(
                        push_leaf,
                        (child_base << 8) | bits_leaf,
                        lstack_ref[k, lslot],
                    )
                    lsp2 = lsp_p + jnp.where(push_leaf, 1, 0)
                    lsps_n[k] = lsp2

                cnt_l = m_l & 15
                tb, tr, ac = leaf_step(
                    k, col_l, cnt_l, t_bs[k], tris_[k], acts[k], leaf_live
                )
                t_n[k] = tb
                tri_n[k] = tr
                act_n[k] = ac
            return (tuple(sps_n), tuple(lsps_n), tuple(t_n), tuple(tri_n),
                    tuple(act_n), ns + 1)

        def cond(c):
            sps, lsps = c[0], c[1]
            live = (sps[0] > 0) | (lsps[0] > 0)
            for k in range(1, K):
                live = live | (sps[k] > 0) | (lsps[k] > 0)
            return live

        init = (
            tuple(
                jnp.where(jnp.max(actives[k]) > 0.0, sp0, 0) for k in range(K)
            ),
            tuple(
                jnp.where(jnp.max(actives[k]) > 0.0, lsp0, 0)
                for k in range(K)
            ),
            tuple(t_bests),
            tuple(jnp.full((1, P), -1.0, jnp.float32) for _ in range(K)),
            tuple(actives),
            jnp.int32(0),
        )
        _, _, t_bs, tris_, _, n_steps = jax.lax.while_loop(cond, body, init)
        steps_v = jnp.full((1, P), n_steps.astype(jnp.float32))
        zero_pad = jnp.zeros((_ROWS_OUT - 3, P), jnp.float32)
        for k in range(K):
            out_ref[:, goff + k * P:goff + (k + 1) * P] = jnp.concatenate(
                [t_bs[k], tris_[k], steps_v, zero_pad], axis=0
            )


# Kernel selection.  The r4 branch-free single-stack kernel (v1) is the
# default: the r5 ABAB production-wave comparison measured it ~7% faster
# end-to-end than the ordered/dual-stack v2 variants (1.59 vs 1.48
# Mrays/s) even though v2 retires fewer packet steps — the step savings
# are paid back in per-step cost.  Set SHIMMER_KERNEL_V1=0 for v2
# (with SHIMMER_UNIFIED / SHIMMER_ORDERED / SHIMMER_GROUPS knobs).
WINID_MIN = os.environ.get("SHIMMER_WINID_MIN", "0") == "1"
KERNEL_V1 = os.environ.get("SHIMMER_KERNEL_V1", "1") == "1" or LEAF_MT
# (LEAF_MT tiles carry (p0,e1,e2) leaf lanes — only the v1 kernel reads
# them in that form, so the MT flag pins kernel selection to v1.)


@functools.partial(
    jax.jit, static_argnames=("stack_size", "interpret", "n_res")
)
def _traverse_call(meta, tiles, rays, *, stack_size, interpret, n_res=None):
    gk = rays.shape[1] // P      # rays: lane-major (_ROWS_IN, gk * P)
    K = K_PACKETS
    n_tiles = tiles.shape[0]
    if n_res is None:
        n_res = VMEM_TABLE_BYTES // (8 * P * 4)
    n_res = min(n_res, n_tiles)
    stream = n_res < n_tiles
    if stream and not interpret:
        # The resident meta prefix (n_res * 8 int32) is DMA'd as a slice,
        # which must align to the (1024,) SMEM tiling → n_res % 128 == 0
        # (interpret mode has no tiling; tests keep tiny budgets there).
        n_res = min(max(128, (n_res // 128) * 128), n_tiles)
        stream = n_res < n_tiles
    groups = TRAVERSE_GROUPS if gk % (K * TRAVERSE_GROUPS) == 0 else 1
    if KERNEL_V1:
        groups = 1
        kern = functools.partial(
            _traverse_kernel, stack_size=stack_size, k_packets=K,
            n_rows=meta.shape[0], n_res=n_res, stream=stream,
        )
        scratch = [
            pltpu.SMEM((K, stack_size), jnp.int32),
            pltpu.VMEM((n_res, 8, P), jnp.float32),
            pltpu.SMEM((min(meta.shape[0], n_res * 8),), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            # Per-chain landing slot + semaphore for streamed tiles.
            pltpu.VMEM((K, 8, P), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ]
    else:
        kern = functools.partial(
            _traverse_kernel_v2, stack_size=stack_size, k_packets=K,
            n_rows=meta.shape[0], n_res=n_res, stream=stream,
            groups=groups,
        )
        scratch = [
            pltpu.SMEM((K, stack_size), jnp.int32),   # internal e0
            pltpu.SMEM((K, stack_size), jnp.int32),   # internal order
            pltpu.SMEM((K, LEAF_STACK), jnp.int32),   # leaf backlog
            pltpu.VMEM((n_res, 8, P), jnp.float32),
            pltpu.SMEM((min(meta.shape[0], n_res * 8),), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            # Per-chain (internal, leaf) landing slots for streamed tiles.
            pltpu.VMEM((K, 2, 8, P), jnp.float32),
            pltpu.SemaphoreType.DMA((K, 2)),
        ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((_ROWS_OUT, gk * P), jnp.float32),
        grid=(gk // (K * groups),),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # meta stays in HBM
            # Lane-major ray rows: block i covers groups*K packets.
            pl.BlockSpec(
                (_ROWS_IN, groups * K * P), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),   # table stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (_ROWS_OUT, groups * K * P), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TABLE_BYTES + 16 * 1024 * 1024,
        ),
    )(meta, rays, tiles)


def _part1by2(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_keys(tris, ray_o, ray_d, want_any=None):
    """Packet-coherence sort keys.

    Extension (closest-hit) rays: origin-Morton-major (6 bits/axis,
    scene-bounds normalized), then direction octant, then a coarse
    direction quantization — bounce rays from nearby points traverse
    similar top-of-tree paths.

    Shadow (any-hit) rays: direction-major — NEE rays aim at a light, so
    their *directions* cluster while their origins spread across the
    scene; octant+fine first, origin Morton last.  A shadow flag above
    both keeps shadow and extension rays in separate packets (their
    traversal orders differ: any-hit lanes exit early, and mixing them
    inflates the shared-stack union)."""
    ext = jnp.maximum(tris.world_max - tris.world_min, 1e-6)
    q = (ray_o - tris.world_min[None, :]) / ext[None, :]
    q = jnp.clip((q * 64.0).astype(jnp.int32), 0, 63)
    morton = (
        _part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )                                                     # 18 bits
    octant = (
        (ray_d[:, 0] < 0).astype(jnp.int32)
        + 2 * (ray_d[:, 1] < 0).astype(jnp.int32)
        + 4 * (ray_d[:, 2] < 0).astype(jnp.int32)
    )
    dq = jnp.clip(
        ((ray_d + 1.0) * 2.0).astype(jnp.int32), 0, 3
    )                                                     # 2 bits/axis
    fine = dq[:, 0] | (dq[:, 1] << 2) | (dq[:, 2] << 4)
    key_ext = (morton << 9) | (octant << 6) | fine        # 27 bits
    if want_any is None:
        return key_ext
    key_sh = (octant << 27) | (fine << 21) | (morton << 3)  # 30 bits
    wa = jnp.asarray(want_any)
    return jnp.where(wa, (1 << 30) | key_sh, key_ext)


def traverse_packets_raw(tris, ray_o, ray_d, t_max, any_hit=False,
                         interpret=False, return_steps=False,
                         sort_rays=False, n_res=None, compact_dead=True):
    """Minimal packet-traversal entry: returns ``(t, tri)`` (and steps
    when requested) in ORIGINAL ray order — t = +inf on miss.

    The hot path: everything beyond the kernel is one optional
    Morton-key argsort (4 reorder gathers in, 2 unsort gathers out).
    Barycentrics / vertices are NOT produced here — callers that need
    them re-intersect the winning triangle (see traverse_packets /
    triangle_scene_intersect), which costs one vertex gather and keeps
    the per-dispatch overhead off shadow-only and raw queries.

    tris: TriangleSceneData (uses tiles8 + meta).  any_hit: python bool
    or per-lane (N,) bool.  interpret: run interpreted (CPU CI).
    sort_rays: order rays by ray_sort_keys before packing into packets
    (pays for itself on incoherent batches and compacts dead lanes into
    zero-step packets).
    """
    # Traversal is discrete: no gradients flow through the kernel (hit
    # geometry gradients come from the caller's re-intersection).  The
    # node tables must be detached here or a vjp over the scene pytree
    # hands the pallas_call nonzero tangents (no JVP rule — hard error).
    tris = jax.tree_util.tree_map(jax.lax.stop_gradient, tris)
    ray_o = jax.lax.stop_gradient(ray_o)
    ray_d = jax.lax.stop_gradient(ray_d)
    t_max = jax.lax.stop_gradient(t_max)
    n = ray_o.shape[0]
    kp = K_PACKETS * P
    g = max(1, -(-n // kp)) * K_PACKETS
    npad = g * P
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    want = jnp.broadcast_to(jnp.asarray(any_hit, bool), (n,))
    inv = None
    if sort_rays and n > P:
        # Dead lanes (t_max <= 0) sort to the end: whole-dead packets
        # exit after zero steps, so sorting doubles as lane compaction
        # for wavefront dispatches with scattered dead lanes.
        keys = jnp.where(
            t_max > 0.0,
            ray_sort_keys(tris, ray_o, ray_d, want_any=want),
            jnp.int32(0x7FFFFFFF),
        )
        order = jnp.argsort(keys)
        inv = order
        ray_o = ray_o[order]
        ray_d = ray_d[order]
        t_max = t_max[order]
        want = want[order]
    elif compact_dead and n > P:
        # O(N) live-first partition (prefix sum, no argsort): wavefront
        # dispatches run at ~30% occupancy with dead lanes scattered
        # through every packet — compacting them empties whole packets
        # (zero traversal steps) at the cost of two cumsums + one
        # unique-index scatter, far below the ~6 ms bitonic argsort.
        # Shadow (any-hit) lanes partition after extension lanes so the
        # two ray classes keep separate packets.
        live = t_max > 0.0
        g0 = live & ~want
        g1 = live & want
        c0 = jnp.cumsum(g0.astype(jnp.int32))
        c1 = jnp.cumsum(g1.astype(jnp.int32))
        n0, n1 = c0[-1], c1[-1]
        dead_rank = (
            jnp.cumsum((~live).astype(jnp.int32)) - 1
        )
        dest = jnp.where(
            g0, c0 - 1, jnp.where(g1, n0 + c1 - 1, n0 + n1 + dead_rank)
        )
        iota = jnp.arange(n, dtype=jnp.int32)
        order = jnp.zeros(n, jnp.int32).at[dest].set(
            iota, unique_indices=True
        )
        inv = order
        ray_o = ray_o[order]
        ray_d = ray_d[order]
        t_max = t_max[order]
        want = want[order]
    if npad != n:
        # padded lanes: d = +z, t_max = 0 -> inactive from the first step
        # Explicit f32 dtypes: with x64 enabled the default-dtype pads
        # would silently promote the whole ray buffer (advisor r3).
        zpad = jnp.zeros((npad - n,), jnp.float32)
        ray_o = jnp.concatenate(
            [ray_o, jnp.zeros((npad - n, 3), jnp.float32)], axis=0
        )
        ray_d = jnp.concatenate(
            [ray_d, jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), (npad - n, 3))],
            axis=0,
        )
        t_max = jnp.concatenate([t_max, zpad], axis=0)
        want = jnp.concatenate([want, zpad > 0.0], axis=0)

    # Loop-invariant per-ray rows, precomputed once here (vectorized
    # XLA) instead of every kernel step: guarded 1/d for the slab test
    # and the watertight shear constants — formulas identical to
    # shapes/triangle.py::intersect_triangle (both IEEE f32, so the
    # caller's re-intersection reproduces the kernel's hit decision).
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    inv_d = 1.0 / jnp.where(ray_d == 0.0, 1e-30, ray_d)  # (npad, 3)
    ad = jnp.abs(ray_d)
    is0 = (ad[:, 0] >= ad[:, 1]) & (ad[:, 0] >= ad[:, 2])
    is1 = (~is0) & (ad[:, 1] >= ad[:, 2])
    pc = jnp.where(is0, 0.0, jnp.where(is1, 1.0, 2.0))
    pdx = jnp.where(is0, dy, jnp.where(is1, dz, dx))
    pdy = jnp.where(is0, dz, jnp.where(is1, dx, dy))
    pdz = jnp.where(is0, dx, jnp.where(is1, dy, dz))
    dz_ok = pdz != 0.0
    pdz_safe = jnp.where(dz_ok, pdz, 1.0)
    lanes = jnp.stack(
        [
            ray_o[:, 0], ray_o[:, 1], ray_o[:, 2], dx, dy, dz,
            t_max, want.astype(jnp.float32),
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
            -pdx / pdz_safe, -pdy / pdz_safe, 1.0 / pdz_safe,
            pc, dz_ok.astype(jnp.float32),
        ],
        axis=0,
    )                                                     # (16, npad)

    out = _traverse_call(
        tris.meta, tris.tiles8, lanes,
        stack_size=int(tris.stack_depth) + 8,
        interpret=interpret, n_res=n_res,
    )                                                     # (8, npad)
    k_rows = 3 if return_steps else 2
    flat = out[:k_rows, :n]
    if inv is not None:
        # Scatter-unsort: one .at[].set per row beats building the
        # inverse permutation (a full (N,) scatter) plus gathers.
        flat = jnp.zeros_like(flat).at[:, inv].set(flat)
    t = flat[0]
    tri = flat[1].astype(jnp.int32)
    t = jnp.where(tri >= 0, t, jnp.inf)
    if return_steps:
        return t, tri, flat[2]
    return t, tri


def traverse_packets(tris, ray_o, ray_d, t_max, any_hit=False,
                     interpret=False, return_steps=False,
                     sort_rays=False):
    """Packet-traversal entry: same contract as
    shapes/triangle.py::_traverse (t, tri_idx, b0, b1, b2, verts).

    The kernel returns only (t, winning tri); vertices and barycentrics
    are re-derived here by re-running the same watertight intersection
    against the winner (one gather + vectorized math, identical
    formulas so the hit decision reproduces bit-for-bit).
    """
    from shimmer_tpu.shapes.triangle import _gather_tri, intersect_triangle

    res = traverse_packets_raw(
        tris, ray_o, ray_d, t_max, any_hit=any_hit, interpret=interpret,
        return_steps=return_steps, sort_rays=sort_rays,
    )
    t, tri = res[0], res[1]
    hit = tri >= 0

    _, p0, p1, p2 = _gather_tri(tris, jnp.maximum(tri, 0))
    h2, t2, b0, b1, b2 = intersect_triangle(
        ray_o, ray_d, jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                       tri.shape), p0, p1, p2
    )
    t_best = jnp.where(hit, t2, jnp.inf)
    b0 = jnp.where(hit, b0, 0.0)
    b1 = jnp.where(hit, b1, 0.0)
    b2 = jnp.where(hit, b2, 0.0)
    verts = jnp.where(
        hit[:, None],
        jnp.concatenate([p0, p1, p2], axis=-1),
        0.0,
    )
    if return_steps:
        return t_best, tri, b0, b1, b2, verts, res[2]
    return t_best, tri, b0, b1, b2, verts
