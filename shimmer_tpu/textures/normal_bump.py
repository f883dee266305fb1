"""Normal and bump mapping.

TPU-native analog of /root/reference/src/material.rs:1400-1508
(normal_map / bump_map) applied inside get_bsdf (interaction.rs:229-250):
adjusts the shading normal/tangent of a SurfaceInteraction before the
shading frame is built.  Evaluated for all lanes and masked by whether the
lane's material carries a map — the wavefront form of the reference's
per-material branch.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from shimmer_tpu.ops.vecmath import (
    Frame,
    cross,
    gram_schmidt,
    length_squared,
    normalize,
)


def apply_normal_bump(scene, si):
    """Returns si with ns/dpdus adjusted by the material's normal or bump
    map (no-op lanes untouched)."""
    table = scene.textures
    if table is None:
        return si
    materials = scene.materials
    n_tex = materials.normal_tex[si.material_id]
    d_tex = materials.displacement_tex[si.material_id]
    has_normal = n_tex >= 0
    has_bump = d_tex >= 0
    any_normal = scene.has_normal_maps
    any_bump = scene.has_bump_maps
    if not (any_normal or any_bump):
        return si

    ns, dpdus = si.ns, si.dpdus

    if any_normal:
        from shimmer_tpu.textures.textures import eval_texture_raw

        raw = eval_texture_raw(table, jnp.maximum(n_tex, 0), si)
        # Tangent-space normal decode: rgb in [0,1] → 2x-1
        # (material.rs:1451-1474).  Normal maps are stored as raw rgb in
        # the atlas (spectrum slot holds the rgb directly for these).
        n_local = normalize(2.0 * raw[..., :3] - 1.0)
        frame = Frame.from_xz(
            normalize(gram_schmidt(si.dpdus, si.ns)), si.ns
        )
        n_new = frame.from_local(n_local)
        # Gram-Schmidt the tangent against the new normal.
        t_new = gram_schmidt(si.dpdus, n_new)
        bad = length_squared(t_new) < 1e-12
        t_new = jnp.where(bad[..., None], frame.x, t_new)
        ns = jnp.where(has_normal[..., None], normalize(n_new), ns)
        dpdus = jnp.where(has_normal[..., None], t_new, dpdus)

    if any_bump:
        from shimmer_tpu.textures.textures import eval_float_texture

        # Finite-difference bump mapping (material.rs:1477-1508): displace
        # along the normal by d(u,v); shading normal from perturbed
        # partials.
        du = 0.5 * (jnp.abs(si.dudx) + jnp.abs(si.dudy))
        dv = 0.5 * (jnp.abs(si.dvdx) + jnp.abs(si.dvdy))
        du = jnp.where(du == 0.0, 0.0005, du)
        dv = jnp.where(dv == 0.0, 0.0005, dv)
        tex_id = jnp.maximum(d_tex, 0)
        disp = eval_float_texture(table, tex_id, si)
        si_du = dataclasses.replace(
            si, uv=si.uv + jnp.stack([du, jnp.zeros_like(du)], -1)
        )
        si_dv = dataclasses.replace(
            si, uv=si.uv + jnp.stack([jnp.zeros_like(dv), dv], -1)
        )
        disp_u = eval_float_texture(table, tex_id, si_du)
        disp_v = eval_float_texture(table, tex_id, si_dv)
        dddu = (disp_u - disp) / du
        dddv = (disp_v - disp) / dv
        dpdu_b = si.dpdus + dddu[..., None] * si.ns
        dpdv_b = si.dpdv + dddv[..., None] * si.ns
        n_b = normalize(cross(dpdu_b, dpdv_b))
        # keep orientation consistent with the geometric normal
        flip = jnp.sum(n_b * si.ns, -1) < 0.0
        n_b = jnp.where(flip[..., None], -n_b, n_b)
        ns = jnp.where(has_bump[..., None], n_b, ns)
        dpdus = jnp.where(has_bump[..., None], dpdu_b, dpdus)

    return dataclasses.replace(si, ns=ns, dpdus=dpdus)
