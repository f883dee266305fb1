"""Triangle intersection + BVH traversal tests: brute-force ground truth,
watertightness-style edge cases, PLY IO, Cornell-box render
(BASELINE config #2 class)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.ops.bvh import build_bvh, bvh_validate
from shimmer_tpu.shapes.mesh import TriangleMesh, quad_mesh, read_ply
from shimmer_tpu.shapes.triangle import (
    build_triangle_scene,
    intersect_triangle,
    triangle_scene_intersect,
    triangle_scene_occluded,
)
from shimmer_tpu.ops.transform import Transform


def _random_soup(rng, n_tris=200, spread=4.0):
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    p = np.concatenate([base, base + e1, base + e2])
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T
    return p, idx


def _brute_force(p, idx, ray_o, ray_d):
    """O(N·T) reference intersection using the same triangle kernel."""
    n = ray_o.shape[0]
    t_mat = []
    for k in range(idx.shape[0]):
        p0 = jnp.broadcast_to(jnp.asarray(p[idx[k, 0]]), (n, 3))
        p1 = jnp.broadcast_to(jnp.asarray(p[idx[k, 1]]), (n, 3))
        p2 = jnp.broadcast_to(jnp.asarray(p[idx[k, 2]]), (n, 3))
        h, t, *_ = intersect_triangle(
            jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.full(n, jnp.inf), p0, p1, p2
        )
        t_mat.append(np.where(np.asarray(h), np.asarray(t), np.inf))
    t_mat = np.stack(t_mat, axis=1)  # (N, T)
    return t_mat.min(axis=1)


class TestTriangleKernel:
    def test_basic_hit(self):
        p0 = jnp.array([[0.0, 0.0, 0.0]])
        p1 = jnp.array([[1.0, 0.0, 0.0]])
        p2 = jnp.array([[0.0, 1.0, 0.0]])
        o = jnp.array([[0.2, 0.2, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h, t, b0, b1, b2 = intersect_triangle(o, d, jnp.array([jnp.inf]), p0, p1, p2)
        assert bool(h[0])
        assert np.isclose(float(t[0]), 1.0)
        np.testing.assert_allclose(np.asarray(b0 + b1 + b2), 1.0, atol=1e-6)

    def test_miss_and_backface(self):
        p0 = jnp.array([[0.0, 0.0, 0.0]] * 2)
        p1 = jnp.array([[1.0, 0.0, 0.0]] * 2)
        p2 = jnp.array([[0.0, 1.0, 0.0]] * 2)
        o = jnp.array([[2.0, 2.0, -1.0], [0.2, 0.2, 1.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        h, t, *_ = intersect_triangle(o, d, jnp.full(2, jnp.inf), p0, p1, p2)
        assert not bool(h[0])  # outside
        assert bool(h[1])  # backface still hits (two-sided geometry)

    def test_edge_through_shared_vertex(self):
        """Rays through shared edges must hit at least one triangle
        (watertightness across a shared edge)."""
        # two tris sharing edge (0,0,0)-(1,0,0)
        p = np.array(
            [[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, -1, 0]], np.float32
        )
        idx = np.array([[0, 1, 2], [1, 0, 3]], np.int32)
        n = 64
        xs = np.linspace(0.01, 0.99, n).astype(np.float32)
        o = np.stack([xs, np.zeros(n), -np.ones(n)], -1)  # aim at the shared edge
        d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
        hits = np.zeros(n, bool)
        for k in range(2):
            h, *_ = intersect_triangle(
                jnp.asarray(o),
                jnp.asarray(d),
                jnp.full(n, jnp.inf),
                jnp.broadcast_to(jnp.asarray(p[idx[k, 0]]), (n, 3)),
                jnp.broadcast_to(jnp.asarray(p[idx[k, 1]]), (n, 3)),
                jnp.broadcast_to(jnp.asarray(p[idx[k, 2]]), (n, 3)),
            )
            hits |= np.asarray(h)
        assert hits.all(), f"{(~hits).sum()} edge rays leaked"


class TestBVH:
    def test_build_valid(self, rng):
        p, idx = _random_soup(rng, 137)
        tri_p = p[idx]
        lo, hi = tri_p.min(1), tri_p.max(1)
        bvh = build_bvh(lo, hi, leaf_size=4)
        assert bvh_validate(bvh, lo, hi)
        # every triangle appears exactly once
        perm = bvh.perm[bvh.perm >= 0]
        assert sorted(perm.tolist()) == list(range(137))

    def test_traversal_matches_brute_force(self, rng):
        p, idx = _random_soup(rng, 150)
        scene = build_triangle_scene(
            [{"p": p, "indices": idx, "material_id": 0}]
        )
        n = 256
        o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        si = triangle_scene_intersect(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)
        )
        t_ref = _brute_force(p, idx, o, d)
        t_bvh = np.where(np.asarray(si.valid), np.asarray(si.t), np.inf)
        hit_match = (t_ref < np.inf) == np.asarray(si.valid)
        assert hit_match.all(), f"{(~hit_match).sum()} hit/miss mismatches"
        both = (t_ref < np.inf) & np.asarray(si.valid)
        np.testing.assert_allclose(t_bvh[both], t_ref[both], rtol=1e-4)

    def test_occlusion_matches(self, rng):
        p, idx = _random_soup(rng, 100)
        scene = build_triangle_scene([{"p": p, "indices": idx, "material_id": 0}])
        n = 128
        o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        occ = triangle_scene_occluded(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.full(n, 1.0)
        )
        t_ref = _brute_force(p, idx, o, d * 1.0)
        np.testing.assert_array_equal(np.asarray(occ), t_ref < 1.0)

    def test_normals_interpolate(self):
        # single triangle with vertex normals tilted
        p = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        nrm = np.array(
            [[0, 0, 1], [0.5, 0, 0.8660254], [0, 0.5, 0.8660254]], np.float32
        )
        scene = build_triangle_scene(
            [{"p": p, "indices": np.array([[0, 1, 2]]), "n": nrm, "material_id": 0}]
        )
        o = jnp.array([[0.3, 0.3, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        si = triangle_scene_intersect(scene, o, d, jnp.full(1, jnp.inf))
        assert bool(si.valid[0])
        ns = np.asarray(si.ns)[0]
        assert not np.allclose(ns, [0, 0, 1], atol=1e-3)  # actually interpolated
        assert np.isclose(np.linalg.norm(ns), 1.0, atol=1e-5)


class TestPly:
    def test_binary_roundtrip(self, tmp_path):
        p = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2, 3]], np.int32)  # one quad
        path = tmp_path / "quad.ply"
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex 4\n")
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"element face 1\n")
            f.write(b"property list uchar int vertex_indices\n")
            f.write(b"end_header\n")
            f.write(p.astype("<f4").tobytes())
            f.write(np.uint8(4).tobytes() + faces.astype("<i4").tobytes())
        mesh = read_ply(path)
        np.testing.assert_allclose(mesh["p"], p)
        assert mesh["indices"].shape == (2, 3)  # quad split into 2 tris

    def test_ascii(self, tmp_path):
        path = tmp_path / "tri.ply"
        path.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2\n"
        )
        mesh = read_ply(path)
        assert mesh["p"].shape == (3, 3)
        assert mesh["indices"].shape == (1, 3)


class TestCornellBox:
    def _scene_and_camera(self):
        from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
        from shimmer_tpu.color.colorspace import get_named_color_space
        from shimmer_tpu.film.filters import BoxFilter
        from shimmer_tpu.film.film import PixelSensor, RgbFilm
        from shimmer_tpu.lights import lights as lt
        from shimmer_tpu.materials import material as mtl
        from shimmer_tpu.scene_builder import build_scene
        from shimmer_tpu.spectra.spectrum import ConstantSpectrum

        cs = get_named_color_space("srgb")
        res = 48
        ct = CameraTransform(
            Transform.look_at(
                jnp.array([0.0, 1.0, 3.9]),
                jnp.array([0.0, 1.0, 0.0]),
                jnp.array([0.0, 1.0, 0.0]),
            )
        )
        cam = PerspectiveCamera(ct, (res, res), fov=50.0)
        film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
        r2w = cam.camera_transform.render_from_world()

        def tmesh(mesh: TriangleMesh, material_id, area_light_id=-1):
            d = mesh.as_scene_dict(material_id, area_light_id)
            return d

        i = Transform.identity()
        # box [-1,1]^2 x [0,2]: floor, ceiling, back, left (red), right (green)
        w = 1.0
        meshes = [
            tmesh(quad_mesh(r2w, [-w, 0, -w], [w, 0, -w], [w, 0, w], [-w, 0, w]), 0),
            tmesh(quad_mesh(r2w, [-w, 2, -w], [-w, 2, w], [w, 2, w], [w, 2, -w]), 0),
            tmesh(quad_mesh(r2w, [-w, 0, -w], [-w, 2, -w], [w, 2, -w], [w, 0, -w]), 0),
            tmesh(quad_mesh(r2w, [-w, 0, -w], [-w, 0, w], [-w, 2, w], [-w, 2, -w]), 1),
            tmesh(quad_mesh(r2w, [w, 0, -w], [w, 2, -w], [w, 2, w], [w, 0, w]), 2),
            # light quad just below the ceiling (2 triangles → lights 0,1)
            tmesh(
                quad_mesh(
                    r2w, [-0.3, 1.99, -0.3], [0.3, 1.99, -0.3],
                    [0.3, 1.99, 0.3], [-0.3, 1.99, 0.3],
                ),
                3,
                area_light_id=np.array([0, 1], np.int32),
            ),
        ]
        from shimmer_tpu.shapes.triangle import build_triangle_scene

        tris = build_triangle_scene(meshes)
        scene = build_scene(
            triangles=tris,
            materials=[
                {"kind": mtl.DIFFUSE, "reflectance": [0.73, 0.73, 0.73]},
                {"kind": mtl.DIFFUSE, "reflectance": [0.65, 0.05, 0.05]},
                {"kind": mtl.DIFFUSE, "reflectance": [0.12, 0.45, 0.15]},
                {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
            ],
            lights=[
                {
                    "kind": lt.AREA,
                    "spectrum": ConstantSpectrum(1.0),
                    "scale": 25.0,
                    "shape_kind": 1,
                    "shape_idx": int(np.asarray(tris.orig_indices).shape[0]) - 2 + k,
                    "two_sided": False,
                }
                for k in range(2)
            ],
            render_from_world=r2w,
        )
        return scene, cam, film

    def test_cornell_render(self):
        from shimmer_tpu.render import render
        from shimmer_tpu.samplers import IndependentSampler

        scene, cam, film = self._scene_and_camera()
        img, _ = render(
            scene, cam, film, IndependentSampler(32), "path", spp=32,
            max_depth=5, wave_spp=32,
        )
        a = np.asarray(img)
        assert np.all(np.isfinite(a))
        assert a.mean() > 0.05, "box too dark — light path broken"
        # look_at mirrors x (pbrt handedness): world -x (red wall) lands on
        # the image's right, +x (green) on the left.
        left = a[16:32, 2:10].mean(axis=(0, 1))
        right = a[16:32, 38:46].mean(axis=(0, 1))
        assert left[1] > 1.5 * left[0], f"image-left wall not green: {left}"
        assert right[0] > 1.5 * right[1], f"image-right wall not red: {right}"
        # color bleeding: floor near the red wall picks up red
        assert a[40:44, 36:42, 0].mean() > a[40:44, 36:42, 1].mean()

    def test_cornell_simplepath_agrees(self):
        from shimmer_tpu.render import render
        from shimmer_tpu.samplers import IndependentSampler

        scene, cam, film = self._scene_and_camera()
        spp = 128
        a, _ = render(
            scene, cam, film, IndependentSampler(spp), "path", spp=spp,
            max_depth=4, wave_spp=64,
        )
        b, _ = render(
            scene, cam, film, IndependentSampler(spp, seed=3), "simplepath",
            spp=spp, max_depth=4, wave_spp=64,
        )
        a, b = np.asarray(a), np.asarray(b)
        rel = abs(a.mean() - b.mean()) / a.mean()
        assert rel < 0.1, f"integrator disagreement {rel}: {a.mean()} vs {b.mean()}"
