"""Host-side scene assembly: python descriptions → device Scene tables.

Plays the role of BasicScene's creation passes
(/root/reference/src/loading/scene.rs:381-907): resolve spectra, bake
material/light tables, compute the static census, build acceleration data.
The pbrt parser (shimmer_tpu.loading) produces the same intermediate dicts
this module consumes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from shimmer_tpu.color.colorspace import RgbColorSpace, get_named_color_space
from shimmer_tpu.lights import lights as lt
from shimmer_tpu.materials import material as mtl
from shimmer_tpu.materials.material import make_material_table
from shimmer_tpu.scene import Scene
from shimmer_tpu.shapes.sphere import make_sphere_data, sphere_area
from shimmer_tpu.spectra.rgb2spec import fit_rgb_coeffs
from shimmer_tpu.spectra.spectrum import (
    Spectrum,
    spectrum_to_photometric,
)


def build_scene(
    spheres: list[dict] | None = None,
    triangles=None,
    patches: list[dict] | None = None,
    instanced=None,
    materials: list[dict] | None = None,
    lights: list[dict] | None = None,
    colorspace: RgbColorSpace | None = None,
    light_sampler: str = "uniform",
    textures=None,
    spectra_table=None,
    env=None,
    env_spec: dict | None = None,
    media: list[dict] | None = None,
    camera_medium: int = -1,
    render_from_world=None,
) -> Scene:
    """Assemble a device Scene.

    materials: dicts with ``kind`` plus per-kind params; ``reflectance`` may
      be an RGB triple (fit to sigmoid coeffs here) or precomputed coeffs.
    lights: dicts with ``kind`` (lt.POINT…), ``spectrum`` (Spectrum object),
      ``scale``, kind-specific fields.  Area lights reference shapes via
      ``shape_kind``/``shape_idx``; photometric normalization (scale /=
      photometric(L), light.rs:599-614) is applied when ``photometric=True``.
    """
    from shimmer_tpu.ops.transform import Transform

    cs = colorspace or get_named_color_space("srgb")
    r_from_w = render_from_world or Transform.identity()
    spheres = [dict(sp) for sp in (spheres or [])]
    # Shapes/lights are described in world space; compose into render space
    # (the reference does the same via render_from_light / render-space
    # pre-transform of vertices, mesh.rs:39-46).
    for sp in spheres:
        o2w = sp.pop("object_to_world", None)
        if "object_to_render" not in sp:
            sp["object_to_render"] = (
                r_from_w @ o2w if o2w is not None else r_from_w
            )
    materials = materials or []
    lights = lights or []

    mat_dicts = []
    for m in materials:
        m = dict(m)
        if "reflectance" in m and "reflectance_coeffs" not in m:
            m["reflectance_coeffs"] = fit_rgb_coeffs(
                np.asarray(m.pop("reflectance"), np.float64)[None], cs
            )[0]
        mat_dicts.append(m)
    mat_table = make_material_table(mat_dicts)
    material_kinds = tuple(sorted({int(m.get("kind", 0)) for m in mat_dicts})) or (
        mtl.DIFFUSE,
    )

    sphere_data = make_sphere_data(spheres) if spheres else None
    if patches:
        from shimmer_tpu.shapes.bilinear import make_bilinear_data

        patch_data = make_bilinear_data(patches, render_from_object=r_from_w)
    else:
        patch_data = None

    # Scene bounds radius for infinite lights.
    if spheres:
        centers = np.stack(
            [
                np.asarray(s.get("object_to_render").m)[0:3, 3]
                if "object_to_render" in s
                else np.zeros(3)
                for s in spheres
            ]
        )
        radii = np.array([s.get("radius", 1.0) for s in spheres])
        scene_radius = float(
            np.max(np.linalg.norm(centers, axis=-1) + radii)
        )
    else:
        scene_radius = 100.0
    for geom in (triangles, instanced):
        if geom is None or not hasattr(geom, "world_min"):
            continue
        lo = np.asarray(geom.world_min)
        hi = np.asarray(geom.world_max)
        scene_radius = max(
            scene_radius, float(np.linalg.norm(hi - lo) * 0.5 + np.linalg.norm((hi + lo) * 0.5))
        )

    # Deferred env-light bake: callers hand the raw map + transform here so
    # the light sees the COMPUTED scene radius, not a hardcoded default
    # (integrator.rs:72-81 preprocesses every light with scene bounds).
    if env is None and env_spec is not None:
        from shimmer_tpu.lights.env import build_env_light

        env = build_env_light(
            env_spec["image"],
            cs,
            scale=float(env_spec.get("scale", 1.0)),
            render_from_light=env_spec.get("render_from_light"),
            scene_radius=scene_radius,
        )

    # --- lights ---
    n_l = len(lights)
    kind = np.zeros(n_l, np.int32)
    spectrum = np.zeros((n_l, 471), np.float32)
    scale = np.ones(n_l, np.float32)
    position = np.zeros((n_l, 3), np.float32)
    direction = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n_l, 1))
    cf_start = np.ones(n_l, np.float32)
    cf_end = np.ones(n_l, np.float32)
    shape_idx = np.full(n_l, -1, np.int32)
    shape_kind = np.zeros(n_l, np.int32)
    two_sided = np.zeros(n_l, bool)
    power = np.ones(n_l, np.float32)
    for i, ld in enumerate(lights):
        kind[i] = ld["kind"]
        spec: Spectrum = ld["spectrum"]
        spectrum[i] = spec.to_dense()
        s = float(ld.get("scale", 1.0))
        if ld.get("photometric", False):
            s /= spectrum_to_photometric(spec)
        scale[i] = s
        pos_w = jnp.asarray(np.asarray(ld.get("position", (0, 0, 0)), np.float32))
        position[i] = np.asarray(r_from_w.apply_point(pos_w))
        d_w = jnp.asarray(np.asarray(ld.get("direction", (0, 0, 1)), np.float32))
        d = np.asarray(r_from_w.apply_vector(d_w))
        direction[i] = d / max(np.linalg.norm(d), 1e-12)
        cf_start[i] = np.cos(np.deg2rad(ld.get("cone_angle", 30.0) - ld.get("cone_delta", 5.0)))
        cf_end[i] = np.cos(np.deg2rad(ld.get("cone_angle", 30.0)))
        shape_idx[i] = ld.get("shape_idx", -1)
        shape_kind[i] = ld.get("shape_kind", 0)
        two_sided[i] = bool(ld.get("two_sided", False))
        # Approximate emitted power for the power light sampler.
        lum = float(np.mean(spectrum[i])) * s
        if ld["kind"] == lt.AREA:
            if ld.get("shape_kind", 0) == 0 and sphere_data is not None:
                area = float(sphere_area(sphere_data)[ld["shape_idx"]])
            elif ld.get("shape_kind", 0) == 2 and patch_data is not None:
                area = float(np.asarray(patch_data.area)[ld["shape_idx"]])
            elif triangles is not None:
                area = float(np.asarray(triangles.tri_area)[ld["shape_idx"]])
            else:
                area = 1.0
            power[i] = lum * area * np.pi * (2.0 if two_sided[i] else 1.0)
        elif ld["kind"] in (lt.UNIFORM_INFINITE, lt.IMAGE_INFINITE, lt.DISTANT):
            power[i] = lum * 4.0 * np.pi * scene_radius**2
        else:
            power[i] = lum * 4.0 * np.pi

    light_data = lt.LightData(
        kind=jnp.asarray(kind),
        spectrum=jnp.asarray(spectrum),
        scale=jnp.asarray(scale),
        position=jnp.asarray(position),
        direction=jnp.asarray(direction),
        cos_falloff_start=jnp.asarray(cf_start),
        cos_falloff_end=jnp.asarray(cf_end),
        shape_idx=jnp.asarray(shape_idx),
        shape_kind=jnp.asarray(shape_kind),
        two_sided=jnp.asarray(two_sided),
        scene_radius=jnp.float32(scene_radius),
    )
    light_kinds = tuple(sorted({int(k) for k in kind})) if n_l else ()
    if light_sampler == "power":
        weights = np.maximum(power, 1e-12)
    else:
        weights = np.ones(max(n_l, 1), np.float32)

    if media:
        from shimmer_tpu.media import make_media_table

        media_table = make_media_table(media, cs)
    else:
        media_table = None
        camera_medium = -1

    return Scene(
        spheres=sphere_data,
        triangles=triangles,
        patches=patch_data,
        instanced=instanced,
        media=media_table,
        camera_medium=int(camera_medium),
        has_interface_media=bool(
            media_table is not None
            and getattr(triangles, "has_iface_media", False)
        ),
        materials=mat_table,
        lights=light_data,
        light_sample_weights=jnp.asarray(weights[:n_l] if n_l else np.ones(0, np.float32)),
        spectra_table=(
            jnp.asarray(spectra_table) if spectra_table is not None else None
        ),
        env=env,
        textures=textures,
        material_kinds=material_kinds,
        light_kinds=light_kinds,
        n_lights=n_l,
        uniform_infinite_indices=tuple(
            int(i) for i in np.nonzero(kind == lt.UNIFORM_INFINITE)[0]
        ),
        image_infinite_indices=tuple(
            int(i) for i in np.nonzero(kind == lt.IMAGE_INFINITE)[0]
        ),
        has_spheres=sphere_data is not None,
        has_triangles=triangles is not None,
        has_patches=patch_data is not None,
        has_instanced=instanced is not None,
        has_normal_maps=any(
            m.get("normal_tex", -1) >= 0 for m in mat_dicts
        ),
        has_bump_maps=any(
            m.get("displacement_tex", -1) >= 0 for m in mat_dicts
        ),
    )
