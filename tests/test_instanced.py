"""Two-level BVH instancing tests (VERDICT r2 item 7; reference
TransformedPrimitive, primitive.rs:136-176)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.shapes.instanced import (
    build_instanced,
    instanced_intersect,
    instanced_occluded,
)
from shimmer_tpu.shapes.triangle import (
    build_triangle_scene,
    triangle_scene_intersect,
)


def _object_mesh(rng, n_tri=60):
    """Small random triangle soup around the origin (object space)."""
    c = rng.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n_tri, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n_tri, 3)).astype(np.float32)
    p = np.concatenate([c, c + e1, c + e2], axis=0)
    idx = np.stack(
        [np.arange(n_tri), np.arange(n_tri) + n_tri,
         np.arange(n_tri) + 2 * n_tri],
        axis=1,
    ).astype(np.int32)
    return {"p": p, "indices": idx, "material_id": 0}


def _transforms():
    def m(tx, ty, tz, s, ry):
        c, sn = np.cos(ry), np.sin(ry)
        rot = np.array(
            [[c, 0, sn], [0, 1, 0], [-sn, 0, c]], np.float64
        )
        out = np.eye(4)
        out[:3, :3] = rot * s
        out[:3, 3] = [tx, ty, tz]
        return out

    return [
        m(0, 0, 0, 1.0, 0.0),
        m(3.0, 0.5, 0, 0.7, 0.8),
        m(-2.5, -0.5, 1.5, 1.4, 2.1),
        m(0.5, 2.5, -2.0, 0.5, -1.2),
    ]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    mesh = _object_mesh(rng)
    mats = _transforms()
    inst = build_instanced([[mesh]], [(0, m) for m in mats])

    # Flattened equivalent: transform vertex copies.
    flat_meshes = []
    for m in mats:
        p = mesh["p"]
        ph = np.concatenate([p, np.ones((len(p), 1), np.float32)], axis=1)
        pw = (m @ ph.T).T[:, :3].astype(np.float32)
        flat_meshes.append(
            {"p": pw, "indices": mesh["indices"], "material_id": 0}
        )
    flat = build_triangle_scene(flat_meshes, traversal="xla")

    o = rng.uniform(-6, 6, (400, 3)).astype(np.float32)
    target = rng.uniform(-1.5, 3.0, (400, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return inst, flat, jnp.asarray(o), jnp.asarray(d)


def test_matches_flattened(setup):
    inst, flat, o, d = setup
    n = o.shape[0]
    t_max = jnp.full(n, jnp.inf)
    si_i = instanced_intersect(inst, o, d, t_max)
    si_f = triangle_scene_intersect(flat, o, d, t_max)
    hi = np.asarray(si_i.valid)
    hf = np.asarray(si_f.valid)
    assert hi.sum() > 50
    assert (hi == hf).all()
    np.testing.assert_allclose(
        np.asarray(si_i.t)[hi], np.asarray(si_f.t)[hi], rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(si_i.p)[hi], np.asarray(si_f.p)[hi],
        rtol=1e-4, atol=1e-5,
    )
    # Geometric normals agree up to float error in the two construction
    # orders (object-space verts + transform vs transformed verts).
    ni = np.asarray(si_i.n)[hi]
    nf = np.asarray(si_f.n)[hi]
    assert np.abs((ni * nf).sum(-1) - 1.0).max() < 1e-3


def test_occlusion_matches(setup):
    inst, flat, o, d = setup
    from shimmer_tpu.shapes.triangle import triangle_scene_occluded

    n = o.shape[0]
    t_max = jnp.full(n, jnp.inf)
    occ_i = np.asarray(instanced_occluded(inst, o, d, t_max))
    occ_f = np.asarray(triangle_scene_occluded(flat, o, d, t_max))
    assert (occ_i == occ_f).all()


def test_memory_is_shared(setup):
    inst, flat, _, _ = setup
    # 4 instances share ONE object BVH: the instanced table must be far
    # smaller than the flattened one (which duplicates all rows).
    r_inst = inst.rows8.shape[0]
    r_flat = flat.rows8.shape[0]
    assert r_inst < r_flat * 0.45, (r_inst, r_flat)
    assert inst.attr_rows.shape[0] * 4 == flat.attr_rows.shape[0]


def test_render_instanced_scene():
    """End-to-end: instanced spheres-of-triangles lit by an area light
    render finitely and match the flattened render."""
    import dataclasses

    import jax

    from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
    from shimmer_tpu.color.colorspace import get_named_color_space
    from shimmer_tpu.film.filters import BoxFilter, get_camera_sample
    from shimmer_tpu.film.film import PixelSensor, RgbFilm
    from shimmer_tpu.integrators.path import li_path
    from shimmer_tpu.lights import lights as lt
    from shimmer_tpu.materials import material as mtl
    from shimmer_tpu.ops.transform import Transform
    from shimmer_tpu.samplers import IndependentSampler
    from shimmer_tpu.scene_builder import build_scene
    from shimmer_tpu.shapes.mesh import quad_mesh
    from shimmer_tpu.spectra.spectrum import ConstantSpectrum

    rng = np.random.default_rng(3)
    mesh = _object_mesh(rng, n_tri=40)
    mats = _transforms()

    cs = get_named_color_space("srgb")
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 1.0, -7.0]),
            jnp.array([0.0, 0.5, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    res = 16
    cam = PerspectiveCamera(ct, (res, res), fov=45.0)
    film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
    r2w = cam.camera_transform.render_from_world()
    r2w_np = np.asarray(r2w.m)

    floor = quad_mesh(
        r2w, [-8, -2, -8], [8, -2, -8], [8, -2, 8], [-8, -2, 8]
    )
    lightq = quad_mesh(
        r2w, [-1, 5, -1], [1, 5, -1], [1, 5, 1], [-1, 5, 1]
    )
    world_meshes = [
        floor.as_scene_dict(0),
        lightq.as_scene_dict(1, area_light_id=np.array([0, 1], np.int32)),
    ]
    tris = build_triangle_scene(world_meshes, traversal="xla")
    n_tri = int(np.asarray(tris.orig_indices).shape[0])

    def scene_with(instanced):
        kw = {}
        if instanced:
            kw["instanced"] = build_instanced(
                [[dict(mesh, material_id=0)]],
                [(0, r2w_np @ m) for m in mats],
            )
            t_world = tris
        else:
            flat = []
            for m in mats:
                p = mesh["p"]
                ph = np.concatenate(
                    [p, np.ones((len(p), 1), np.float32)], axis=1
                )
                pw = ((r2w_np @ m) @ ph.T).T[:, :3].astype(np.float32)
                flat.append(
                    {"p": pw, "indices": mesh["indices"], "material_id": 0}
                )
            t_world = build_triangle_scene(
                world_meshes + flat, traversal="xla"
            )
        return build_scene(
            triangles=t_world,
            materials=[
                {"kind": mtl.DIFFUSE, "reflectance": [0.6, 0.5, 0.4]},
                {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
            ],
            lights=[
                {
                    "kind": lt.AREA,
                    "spectrum": ConstantSpectrum(1.0),
                    "scale": 30.0,
                    "shape_kind": 1,
                    "shape_idx": n_tri - 2 + k,
                }
                for k in range(2)
            ],
            render_from_world=r2w,
            **kw,
        )

    def mean_img(scene, spp=32):
        sampler = IndependentSampler(spp, seed=9)
        ys, xs = jnp.meshgrid(
            jnp.arange(res, dtype=jnp.int32),
            jnp.arange(res, dtype=jnp.int32),
            indexing="ij",
        )
        pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

        def one(sample_index):
            s_state = sampler.start_pixel_sample(pixel_xy, sample_index)
            u_lam, s_state = sampler.get_1d(s_state)
            swl = film.sample_wavelengths(u_lam)
            u_f, s_state = sampler.get_pixel_2d(s_state)
            u_l, s_state = sampler.get_2d(s_state)
            p_film, _, u_l = get_camera_sample(film.filter, pixel_xy, u_f, u_l)
            ray = cam.generate_ray(p_film, u_l)
            return jnp.mean(li_path(scene, ray, swl, sampler, s_state, 3), axis=-1)

        vals = jax.lax.map(one, jnp.arange(spp, dtype=jnp.uint32))
        return np.asarray(jnp.mean(vals, axis=0))

    img_i = mean_img(scene_with(True))
    img_f = mean_img(scene_with(False))
    assert np.isfinite(img_i).all() and img_i.mean() > 0
    # Same sampler streams + same geometry -> near-identical images.
    np.testing.assert_allclose(img_i.mean(), img_f.mean(), rtol=1e-2)
    denom = np.maximum(img_f, 0.05 * img_f.max())
    assert np.quantile(np.abs(img_i - img_f) / denom, 0.95) < 0.05
