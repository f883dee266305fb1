"""Wavefront-vs-megakernel equivalence.

The regenerating wavefront (integrators/wavefront.py) must compute the
same estimator as the masked megakernel li_path — identical sampler draw
order per (pixel, sample, bounce) — so full-wave images agree to float
accumulation order."""

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.film.filters import BoxFilter
from shimmer_tpu.film.film import PixelSensor, RgbFilm
from shimmer_tpu.lights import lights as lt
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.ops.transform import Transform
from shimmer_tpu.render import (
    make_wave_renderer,
    make_wavefront_renderer,
    pixel_blocks,
)
from shimmer_tpu.samplers import IndependentSampler
from shimmer_tpu.scene_builder import build_scene
from shimmer_tpu.shapes.mesh import quad_mesh
from shimmer_tpu.shapes.triangle import build_triangle_scene
from shimmer_tpu.spectra.spectrum import ConstantSpectrum


def _scene_cam_film(res=48):
    cs = get_named_color_space("srgb")
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 1.0, -3.5]),
            jnp.array([0.0, 0.5, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    cam = PerspectiveCamera(ct, (res, res), fov=50.0)
    film = RgbFilm((res, res), BoxFilter(), PixelSensor(cs), cs)
    r2w = cam.camera_transform.render_from_world()

    floor = quad_mesh(r2w, [-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4])
    wall = quad_mesh(r2w, [-4, 0, 2], [4, 0, 2], [4, 4, 2], [-4, 4, 2])
    lightq = quad_mesh(
        r2w, [-0.5, 2.5, -0.5], [0.5, 2.5, -0.5], [0.5, 2.5, 0.5],
        [-0.5, 2.5, 0.5],
    )
    tris = build_triangle_scene(
        [
            floor.as_scene_dict(0),
            wall.as_scene_dict(1),
            lightq.as_scene_dict(2, area_light_id=np.array([0, 1], np.int32)),
        ]
    )
    n_tri = int(np.asarray(tris.orig_indices).shape[0])
    scene = build_scene(
        triangles=tris,
        spheres=[{"radius": 0.5, "center": [0.0, 0.5, 0.0], "material_id": 0}],
        materials=[
            {"kind": mtl.DIFFUSE, "reflectance": [0.6, 0.3, 0.2]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.4, 0.4, 0.45]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.7, 0.7, 0.7]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
        ],
        lights=[
            {
                "kind": lt.AREA,
                "spectrum": ConstantSpectrum(1.0),
                "scale": 10.0,
                "shape_kind": 1,
                "shape_idx": n_tri - 2 + k,
            }
            for k in range(2)
        ],
        render_from_world=r2w,
    )
    return scene, cam, film


def test_wavefront_matches_megakernel():
    scene, cam, film = _scene_cam_film()
    spp = 4
    sampler = IndependentSampler(spp)
    blocks, valids = pixel_blocks(film, 48 * 48)
    idx = jnp.arange(spp, dtype=jnp.uint32)

    mk = make_wave_renderer(scene, cam, film, sampler, "path", max_depth=4)
    st_mk = mk(film.init_state(), idx, blocks[0], valids[0])
    img_mk = np.asarray(film.get_image(st_mk))

    wf = make_wavefront_renderer(scene, cam, film, sampler, max_depth=4)
    st_wf = wf(film.init_state(), idx, blocks[0], valids[0])
    img_wf = np.asarray(film.get_image(st_wf))

    assert np.isfinite(img_wf).all()
    assert img_wf.mean() > 0.01
    # Same estimator, same draws -> agreement to accumulation order.
    diff = np.abs(img_wf - img_mk)
    rel = diff.max() / max(img_mk.max(), 1e-6)
    assert rel < 2e-3, f"wavefront diverges from megakernel: rel {rel}"


def test_wavefront_partial_pool_and_padding():
    """Pool smaller than the lane count + padded invalid pixels."""
    scene, cam, film = _scene_cam_film(res=20)
    spp = 2
    sampler = IndependentSampler(spp)
    # Block bigger than the pixel count: forces padded invalid lanes.
    blocks, valids = pixel_blocks(film, 512)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    wf = make_wavefront_renderer(scene, cam, film, sampler, max_depth=3)
    st = film.init_state()
    for b in range(blocks.shape[0]):
        st = wf(st, idx, blocks[b], valids[b])
    img = np.asarray(film.get_image(st))
    w = np.asarray(st.weight_sum)
    assert np.isfinite(img).all()
    # every real pixel got exactly spp samples' worth of weight
    assert (w > 0).all()
