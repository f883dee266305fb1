"""Rays and ray differentials as batched pytrees.

TPU-native analog of /root/reference/src/ray.rs.  A Ray holds (..., 3)
origin/direction arrays for a whole wavefront; RayDifferential carries the
auxiliary x/y rays used for texture filtering (ray.rs:101-160).
"""

from __future__ import annotations

import jax.numpy as jnp

from shimmer_tpu.ops.vecmath import dot, face_forward
from shimmer_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class Ray:
    o: jnp.ndarray  # (..., 3)
    d: jnp.ndarray  # (..., 3)
    time: jnp.ndarray | None = None

    def at(self, t):
        return self.o + t[..., None] * self.d


@pytree_dataclass
class RayDifferential:
    ray: Ray
    rx_o: jnp.ndarray
    rx_d: jnp.ndarray
    ry_o: jnp.ndarray
    ry_d: jnp.ndarray
    has_differentials: jnp.ndarray  # (...,) bool

    @staticmethod
    def from_ray(ray: Ray) -> "RayDifferential":
        z = jnp.zeros_like(ray.o)
        return RayDifferential(
            ray=ray,
            rx_o=z,
            rx_d=z,
            ry_o=z,
            ry_d=z,
            has_differentials=jnp.zeros(ray.o.shape[:-1], bool),
        )

    def scale_differentials(self, s):
        """Scale aux rays about the main ray (ray.rs scale_differentials);
        used for the max(0.125, 1/sqrt(spp)) spp adjustment
        (integrator.rs:356-362)."""
        o, d = self.ray.o, self.ray.d
        s = jnp.asarray(s, jnp.float32)[..., None]
        return RayDifferential(
            ray=self.ray,
            rx_o=o + (self.rx_o - o) * s,
            rx_d=d + (self.rx_d - d) * s,
            ry_o=o + (self.ry_o - o) * s,
            ry_d=d + (self.ry_d - d) * s,
            has_differentials=self.has_differentials,
        )


def offset_ray_origin(p, n, w):
    """Offset a spawned ray origin off the surface to avoid
    self-intersection.

    The reference offsets along the normal by the intersection-point error
    bound (ray.rs:53-99, pbrt 6.8.6).  We do not carry per-point error
    intervals on device, so the offset is a conservative relative epsilon
    scaled by |p| — equivalent robustness for f32 scene scales.
    """
    d = jnp.sum(jnp.abs(p), axis=-1) * 1e-5 + 1e-6
    offset_n = face_forward(n, w)
    return p + offset_n * d[..., None]


def spawn_ray(p, n, d):
    """Ray leaving a surface point in direction d (interaction.rs spawn_ray)."""
    return Ray(o=offset_ray_origin(p, n, d), d=d)


def spawn_ray_to(p, n, target, target_n=None):
    """Shadow ray from p toward target, both endpoints offset."""
    d = target - p
    o = offset_ray_origin(p, n, d)
    if target_n is not None:
        target = offset_ray_origin(target, target_n, -d)
    return Ray(o=o, d=target - o)
