"""Numerical-robustness stress tests (VERDICT r3 missing #6).

The reference guards quadric/triangle intersection with interval
arithmetic and an f64 edge-function fallback
(/root/reference/src/interval.rs:28, sphere.rs:95-120,
triangle.rs:243-268); this package replaces both with compensated-f32
formulas (difference_of_products, gamma error bounds, robust spawn).
These tests are the stress evidence that the replacement holds:

* grazing-sphere rays (near-tangent quadratic, catastrophic b^2-4ac)
* thin sliver triangles (edge functions near cancellation)
* large-translation scenes (absolute coordinates >> extents)
* watertight mesh closure under random ray fans (no leaks through a
  closed icosphere from inside)
"""

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.transform import Transform
from shimmer_tpu.shapes.sphere import make_sphere_data, sphere_intersect
from shimmer_tpu.shapes.triangle import (
    build_triangle_scene,
    intersect_triangle,
    triangle_scene_intersect,
)


def _icosphere(subdiv=2, radius=1.0, center=(0.0, 0.0, 0.0)):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdiv):
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        es = np.sort(e, axis=1)
        keys = es[:, 0] * (1 << 32) + es[:, 1]
        _, first, inv = np.unique(keys, return_index=True, return_inverse=True)
        mid = len(v) + inv
        nv = 0.5 * (v[es[:, 0]] + v[es[:, 1]])
        nv /= np.linalg.norm(nv, axis=1, keepdims=True)
        v = np.concatenate([v, nv[first]])
        m01, m12, m20 = mid[: len(f)], mid[len(f): 2 * len(f)], mid[2 * len(f):]
        f = np.concatenate([
            np.stack([f[:, 0], m01, m20], 1),
            np.stack([f[:, 1], m12, m01], 1),
            np.stack([f[:, 2], m20, m12], 1),
            np.stack([m01, m12, m20], 1),
        ])
    return (v * radius + np.asarray(center)).astype(np.float32), f.astype(np.int32)


class TestGrazingSphere:
    def test_grazing_rays_consistent(self):
        """Rays with impact parameter b in [r(1-eps), r(1+eps)]: the hit
        decision must agree with exact f64 geometry except within a
        2-ulp band around tangency, and every reported hit must lie on
        the sphere to tight tolerance."""
        r = 1.0
        data = make_sphere_data([{"radius": r, "material_id": 0}])
        n = 4096
        rng = np.random.default_rng(0)
        eps = np.concatenate([
            -np.logspace(-7, -2, n // 2), np.logspace(-7, -2, n // 2)
        ])
        b = (r * (1.0 + eps)).astype(np.float32)
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        o = np.stack([b * np.cos(phi), b * np.sin(phi), np.full(n, -10.0, np.float32)], -1)
        d = np.broadcast_to(np.array([0, 0, 1.0], np.float32), (n, 3))
        si = sphere_intersect(
            data, jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)
        )
        valid = np.asarray(si.valid)
        # exact classification from f64 on the f32-rounded inputs
        b64 = np.linalg.norm(o[:, :2].astype(np.float64), axis=1)
        should = b64 < r
        # Irreducible f32 band: the quadratic's inputs (|o| ~ 10) carry
        # ~|o|*eps rounding, so tangency classification is undefined
        # within ~a few ulps of that — the reference's intervals would
        # mark the same band uncertain (interval.rs:28).
        band = np.abs(b64 - r) < 4.0 * 10.0 * np.finfo(np.float32).eps
        wrong = (valid != should) & ~band
        assert not wrong.any(), f"{wrong.sum()} grazing misclassifications"
        # all reported hit points lie on the sphere
        p = np.asarray(si.p)[valid]
        rr = np.linalg.norm(p.astype(np.float64), axis=1)
        assert np.abs(rr - r).max() < 5e-6

    def test_grazing_large_translation(self):
        """Same grazing fan against a sphere centered 10^4 units away:
        absolute-coordinate cancellation must not produce false hits or
        off-surface points."""
        c = np.array([8192.0, 4096.0, 8192.0])
        r = 1.0
        data = make_sphere_data([
            {"radius": r, "material_id": 0,
             "object_to_render": Transform.translate(jnp.asarray(c))}
        ])
        n = 2048
        rng = np.random.default_rng(1)
        eps = np.concatenate([
            -np.logspace(-5, -2, n // 2), np.logspace(-5, -2, n // 2)
        ])
        b = (r * (1.0 + eps))
        phi = rng.uniform(0, 2 * np.pi, n)
        o = np.stack([
            c[0] + b * np.cos(phi), c[1] + b * np.sin(phi),
            np.full(n, c[2] - 50.0)
        ], -1).astype(np.float32)
        d = np.broadcast_to(np.array([0, 0, 1.0], np.float32), (n, 3))
        si = sphere_intersect(
            data, jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)
        )
        valid = np.asarray(si.valid)
        b64 = np.linalg.norm(o.astype(np.float64)[:, :2] - c[None, :2], axis=1)
        should = b64 < r
        # f32 absolute coords at 8k: one ulp is ~1e-3 -> generous band
        band = np.abs(b64 - r) < 5e-3
        wrong = (valid != should) & ~band
        assert not wrong.any(), f"{wrong.sum()} misclassified at 8k offset"
        p = np.asarray(si.p)[valid]
        rr = np.linalg.norm(p.astype(np.float64) - c, axis=1)
        assert np.abs(rr - r).max() < 5e-3


class TestSliverTriangles:
    def test_thin_triangle_hits(self):
        """Sliver triangles with aspect ratio up to 10^6: rays aimed at
        interior points (in f64) must hit in f32."""
        rng = np.random.default_rng(2)
        n = 2048
        widths = 10.0 ** rng.uniform(-6, -1, n)
        p0 = np.stack([-np.ones(n), np.zeros(n), np.zeros(n)], -1)
        p1 = np.stack([np.ones(n), np.zeros(n), np.zeros(n)], -1)
        p2 = np.stack([np.zeros(n), widths, np.zeros(n)], -1)
        # aim at the incenter-ish point (well inside even for slivers)
        b = rng.uniform(0.2, 0.8, (n, 3))
        b /= b.sum(1, keepdims=True)
        target = b[:, 0:1] * p0 + b[:, 1:2] * p1 + b[:, 2:3] * p2
        o = target + np.array([0, 0, 7.0])
        d = np.array([0, 0, -1.0]) + np.zeros((n, 3))
        h, t, b0, b1, b2 = intersect_triangle(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.full(n, jnp.inf),
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(p2, jnp.float32),
        )
        hit = np.asarray(h)
        assert hit.mean() > 0.999, f"{(~hit).sum()} sliver interior misses"
        # barycentrics of hits reconstruct the target point
        bsum = np.asarray(b0 + b1 + b2)[hit]
        np.testing.assert_allclose(bsum, 1.0, atol=1e-3)


class TestClosedMeshWatertight:
    def test_no_leaks_from_inside(self):
        """Random rays from inside a closed icosphere must ALL hit it —
        a single escape is a watertightness leak through an edge/vertex
        (aggregate-level: BVH traversal + shared-edge fans)."""
        v, f = _icosphere(subdiv=2)
        tris = build_triangle_scene([{"p": v, "indices": f}])
        n = 8192
        rng = np.random.default_rng(3)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.zeros((n, 3), np.float32)
        si = triangle_scene_intersect(
            tris, jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)
        )
        valid = np.asarray(si.valid)
        assert valid.all(), f"{(~valid).sum()} rays leaked through the mesh"

    def test_no_leaks_far_from_origin(self):
        """Same closed-mesh fan with the sphere translated 4096 units:
        the pre-transformed vertex pool loses absolute precision, the
        mesh must stay watertight."""
        v, f = _icosphere(subdiv=2, center=(4096.0, 0.0, 4096.0))
        tris = build_triangle_scene([{"p": v, "indices": f}])
        n = 8192
        rng = np.random.default_rng(4)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(
            np.array([4096.0, 0.0, 4096.0], np.float32), (n, 3)
        )
        si = triangle_scene_intersect(
            tris, jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)
        )
        valid = np.asarray(si.valid)
        assert valid.all(), f"{(~valid).sum()} rays leaked at 4k offset"
