"""Batched 2/3-vector geometry on ``(..., 2|3)`` arrays.

TPU-native replacement for the reference's typed tuple hierarchy
(/root/reference/src/vecmath/, src/frame.rs).  Instead of distinct
Point/Vector/Normal types with trait dispatch, everything is a jnp array with
a trailing component axis; the *transform* module preserves the semantic
distinction (points get translation, normals get inverse-transpose).  All
functions broadcast over leading batch dims and are jit/pallas safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shimmer_tpu.ops.math import difference_of_products, safe_acos, safe_sqrt, sqr
from shimmer_tpu.utils.pytree import pytree_dataclass


def vec(x, y, z, dtype=jnp.float32):
    """Stack components into a (..., 3) array."""
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)],
        axis=-1,
    )


def vec2(x, y, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype)], axis=-1)


def dot(a, b):
    """Component dot product over the trailing axis, keeping batch dims."""
    return jnp.sum(a * b, axis=-1)


def abs_dot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    """Robust cross product using difference_of_products
    (reference: src/vecmath/vector.rs cross)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [
            difference_of_products(ay, bz, az, by),
            difference_of_products(az, bx, ax, bz),
            difference_of_products(ax, by, ay, bx),
        ],
        axis=-1,
    )


def length_squared(v):
    return dot(v, v)


def length(v):
    # safe_sqrt: grad clamped at 0 so masked degenerate lanes don't NaN.
    return safe_sqrt(length_squared(v))


def normalize(v):
    """v / |v|; returns v unchanged where |v| == 0 to avoid NaN in dead
    lanes.  The zero-length guard is applied *inside* the rsqrt (double-
    where), so reverse-mode AD never sees sqrt'(0) = inf — a 0·inf = NaN
    otherwise poisons gradients of every masked consumer."""
    l2 = jnp.sum(v * v, axis=-1)
    ok = l2 > 0.0
    inv = jax.lax.rsqrt(jnp.where(ok, l2, 1.0))
    return v * jnp.where(ok, inv, 1.0)[..., None]


def distance(p, q):
    return length(p - q)


def distance_squared(p, q):
    return length_squared(p - q)


def face_forward(n, v):
    """Flip n to the same hemisphere as v (src/vecmath/normal.rs face_forward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1):
    """Branchless orthonormal basis from a unit vector.

    Duff et al. 2017, as used in the reference (src/vecmath/vector.rs
    coordinate_system).  Returns (v2, v3) with [v1 v2 v3] orthonormal.
    """
    z = v1[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack(
        [1.0 + sign * sqr(v1[..., 0]) * a, sign * b, -sign * v1[..., 0]], axis=-1
    )
    v3 = jnp.stack([b, sign + sqr(v1[..., 1]) * a, -v1[..., 1]], axis=-1)
    return v2, v3


def gram_schmidt(v, w):
    """Orthogonalize v against unit w (src/vecmath/vector.rs gram_schmidt)."""
    return v - dot(v, w)[..., None] * w


def angle_between(a, b):
    """Numerically stable angle between unit vectors (Hatch's trick;
    src/vecmath/vector.rs angle_between)."""
    cond = dot(a, b) < 0.0
    small = jnp.where(cond[..., None], a + b, b - a)
    half = 2.0 * jnp.arcsin(jnp.clip(length(small) / 2.0, -1.0, 1.0))
    return jnp.where(cond, jnp.pi - half, half)


# --- spherical geometry (src/vecmath/mod.rs spherical helpers) ---


def spherical_direction(sin_theta, cos_theta, phi):
    sin_theta = jnp.clip(sin_theta, -1.0, 1.0)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    return vec(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def spherical_theta(v):
    return safe_acos(v[..., 2])


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return sqr(w[..., 2])


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / cos_theta(w)


def tan2_theta(w):
    # inf at cos == 0 (callers mask on isfinite), but the division's
    # denominator is guarded inside (double-where) so reverse-mode AD of
    # masked lanes sees 1/1, not 1/0 = inf (0·inf = NaN otherwise).
    c2 = cos2_theta(w)
    ok = c2 > 0.0
    return jnp.where(ok, sin2_theta(w) / jnp.where(ok, c2, 1.0), jnp.inf)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def spherical_triangle_area(a, b, c):
    """Signed solid angle of a spherical triangle (Van Oosterom & Strackee;
    src/vecmath/mod.rs spherical_triangle_area)."""
    return jnp.abs(
        2.0
        * jnp.arctan2(dot(a, cross(b, c)), 1.0 + dot(a, b) + dot(a, c) + dot(b, c))
    )


def spherical_quad_area(a, b, c, d):
    """Solid angle of a spherical quad (src/vecmath/mod.rs)."""
    axb, bxc = cross(a, b), cross(b, c)
    cxd, dxa = cross(c, d), cross(d, a)
    eps = 1e-9

    def _angle(u, v):
        return angle_between(normalize(u), normalize(v))

    g1 = _angle(dxa, -axb)
    g2 = _angle(axb, -bxc)
    g3 = _angle(bxc, -cxd)
    g4 = _angle(cxd, -dxa)
    area = jnp.abs(g1 + g2 + g3 + g4 - 2.0 * jnp.pi)
    degenerate = (
        (length_squared(axb) < eps)
        | (length_squared(bxc) < eps)
        | (length_squared(cxd) < eps)
        | (length_squared(dxa) < eps)
    )
    return jnp.where(degenerate, 0.0, area)


# --- octahedral / equal-area mappings (src/math.rs:456-520) ---


def equal_area_square_to_sphere(p):
    """Map [0,1]^2 to the unit sphere, equal-area octahedral
    (Clarberg 2008; reference src/math.rs equal_area_square_to_sphere)."""
    u = 2.0 * p[..., 0] - 1.0
    v = 2.0 * p[..., 1] - 1.0
    up = jnp.abs(u)
    vp = jnp.abs(v)
    sd = 1.0 - (up + vp)
    d = jnp.abs(sd)
    r = 1.0 - d
    phi = jnp.where(r == 0.0, 1.0, (vp - up) / jnp.where(r == 0.0, 1.0, r) + 1.0) * (
        jnp.pi / 4.0
    )
    z = jnp.copysign(1.0 - sqr(r), sd)
    cos_p = jnp.copysign(jnp.cos(phi), u)
    sin_p = jnp.copysign(jnp.sin(phi), v)
    scale = r * safe_sqrt(2.0 - sqr(r))
    return vec(cos_p * scale, sin_p * scale, z)


def equal_area_sphere_to_square(d):
    """Inverse of equal_area_square_to_sphere (src/math.rs)."""
    x = jnp.abs(d[..., 0])
    y = jnp.abs(d[..., 1])
    z = jnp.abs(d[..., 2])
    r = safe_sqrt(1.0 - z)
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0.0, 0.0, b / jnp.where(a == 0.0, 1.0, a))
    phi = jnp.arctan(b) * (2.0 / jnp.pi)
    phi = jnp.where(x < y, 1.0 - phi, phi)
    v = phi * r
    u = r - v
    # Southern hemisphere: fold.
    south = d[..., 2] < 0.0
    u, v = jnp.where(south, 1.0 - v, u), jnp.where(south, 1.0 - u, v)
    u = jnp.copysign(u, d[..., 0])
    v = jnp.copysign(v, d[..., 1])
    return vec2(0.5 * (u + 1.0), 0.5 * (v + 1.0))


def wrap_equal_area_square(uv):
    """Wrap out-of-bounds equal-area square coords (src/math.rs)."""
    u, v = uv[..., 0], uv[..., 1]
    u_lt, u_gt = u < 0.0, u > 1.0
    v_lt, v_gt = v < 0.0, v > 1.0
    u2 = jnp.where(u_lt, -u, jnp.where(u_gt, 2.0 - u, u))
    v2 = jnp.where(u_lt | u_gt, 1.0 - v, v)
    v3 = jnp.where(v_lt, -v2, jnp.where(v_gt, 2.0 - v2, v2))
    u3 = jnp.where(v_lt | v_gt, 1.0 - u2, u2)
    return vec2(u3, v3)


# --- orthonormal frame (src/frame.rs) ---


@pytree_dataclass
class Frame:
    """Orthonormal basis; batched over leading dims of x/y/z (each (...,3))."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @staticmethod
    def from_z(z):
        x, y = coordinate_system(z)
        return Frame(x=x, y=y, z=z)

    @staticmethod
    def from_x(x):
        y, z = coordinate_system(x)
        return Frame(x=x, y=y, z=z)

    @staticmethod
    def from_xz(x, z):
        y = cross(z, x)
        return Frame(x=x, y=y, z=z)

    def to_local(self, v):
        return jnp.stack([dot(v, self.x), dot(v, self.y), dot(v, self.z)], axis=-1)

    def from_local(self, v):
        return (
            v[..., 0:1] * self.x + v[..., 1:2] * self.y + v[..., 2:3] * self.z
        )
