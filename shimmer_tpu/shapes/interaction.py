"""Surface interaction records (batched SoA).

TPU-native analog of /root/reference/src/interaction.rs.  One
SurfaceInteraction holds a wavefront of hit points; dead lanes carry
arbitrary-but-finite values and are masked by ``valid``.
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.vecmath import face_forward, normalize, cross, dot
from shimmer_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class SurfaceInteraction:
    valid: jnp.ndarray    # (...,) bool — hit mask
    t: jnp.ndarray        # (...,) hit distance
    p: jnp.ndarray        # (..., 3) hit point (render space)
    n: jnp.ndarray        # (..., 3) geometric normal
    uv: jnp.ndarray       # (..., 2)
    wo: jnp.ndarray       # (..., 3) outgoing direction (toward ray origin)
    dpdu: jnp.ndarray     # (..., 3)
    dpdv: jnp.ndarray     # (..., 3)
    ns: jnp.ndarray       # (..., 3) shading normal
    dpdus: jnp.ndarray    # (..., 3) shading dpdu
    material_id: jnp.ndarray    # (...,) int32, -1 = none
    area_light_id: jnp.ndarray  # (...,) int32, -1 = none
    # MediumInterface ids (media.py): -2 = shape declares no interface
    # (crossing does not change the medium), -1 = vacuum side.
    med_in: jnp.ndarray         # (...,) int32
    med_out: jnp.ndarray        # (...,) int32
    # Texture-filtering footprint (computed from ray differentials).
    dudx: jnp.ndarray
    dvdx: jnp.ndarray
    dudy: jnp.ndarray
    dvdy: jnp.ndarray

    @staticmethod
    def make(
        valid,
        t,
        p,
        n,
        uv,
        wo,
        dpdu,
        dpdv,
        ns=None,
        dpdus=None,
        material_id=None,
        area_light_id=None,
        med_in=None,
        med_out=None,
    ) -> "SurfaceInteraction":
        batch = valid.shape
        z = jnp.zeros(batch, jnp.float32)
        ii = lambda v: (
            v if v is not None else jnp.full(batch, -1, jnp.int32)
        )
        im = lambda v: (
            v if v is not None else jnp.full(batch, -2, jnp.int32)
        )
        return SurfaceInteraction(
            valid=valid,
            t=t,
            p=p,
            n=n,
            uv=uv,
            wo=wo,
            dpdu=dpdu,
            dpdv=dpdv,
            ns=ns if ns is not None else n,
            dpdus=dpdus if dpdus is not None else dpdu,
            material_id=ii(material_id),
            area_light_id=ii(area_light_id),
            med_in=im(med_in),
            med_out=im(med_out),
            dudx=z,
            dvdx=z,
            dudy=z,
            dvdy=z,
        )

    def with_camera_differentials(self, ray_d, spread):
        """Approximate screen-space uv derivatives from an angular pixel
        footprint (the reference's camera fallback, interaction.rs:280-366 +
        camera.rs approximate_dp_dxy): dpdx ≈ t·spread along two axes
        perpendicular to the ray, then least-squares projection onto
        (dpdu, dpdv)."""
        from shimmer_tpu.ops.vecmath import coordinate_system, normalize

        d = normalize(ray_d)
        ex, ey = coordinate_system(d)
        r = (self.t * spread)[..., None]
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        dpdx = ex * r
        dpdy = ey * r
        ata00 = dot(self.dpdu, self.dpdu)
        ata01 = dot(self.dpdu, self.dpdv)
        ata11 = dot(self.dpdv, self.dpdv)
        det = ata00 * ata11 - ata01 * ata01
        inv = jnp.where(jnp.abs(det) > 1e-18, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)

        def solve(dp):
            b0 = dot(self.dpdu, dp)
            b1 = dot(self.dpdv, dp)
            du = (ata11 * b0 - ata01 * b1) * inv
            dv = (ata00 * b1 - ata01 * b0) * inv
            ok = jnp.isfinite(du) & jnp.isfinite(dv)
            return jnp.where(ok, du, 0.0), jnp.where(ok, dv, 0.0)

        dudx, dvdx = solve(dpdx)
        dudy, dvdy = solve(dpdy)
        import dataclasses

        return dataclasses.replace(
            self, dudx=dudx, dvdx=dvdx, dudy=dudy, dvdy=dvdy
        )

    def shading_frame(self):
        from shimmer_tpu.ops.vecmath import Frame, gram_schmidt

        # Build frame from shading normal + tangent (bsdf.rs:21-29).
        ns = self.ns
        t = normalize(gram_schmidt(self.dpdus, ns))
        # Guard degenerate tangents.
        bad = jnp.sum(t * t, axis=-1) < 1e-12
        fallback = Frame.from_z(ns)
        f = Frame.from_xz(t, ns)
        return Frame(
            x=jnp.where(bad[..., None], fallback.x, f.x),
            y=jnp.where(bad[..., None], fallback.y, f.y),
            z=ns,
        )
