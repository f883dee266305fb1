"""4x4 transforms with cached inverses, batched.

TPU-native analog of /root/reference/src/transform.rs (Transform with cached
inverse) and src/square_matrix.rs.  A Transform is a pytree of (..., 4, 4)
matrix + inverse; application functions preserve point/vector/normal
semantics that the reference encodes in its type system.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.vecmath import cross, dot, normalize, vec
from shimmer_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class Transform:
    m: jnp.ndarray      # (..., 4, 4)
    m_inv: jnp.ndarray  # (..., 4, 4)

    # -- constructors (host- or trace-time) --

    @staticmethod
    def identity():
        eye = jnp.eye(4, dtype=jnp.float32)
        return Transform(m=eye, m_inv=eye)

    @staticmethod
    def from_matrix(m):
        m = jnp.asarray(m, jnp.float32)
        return Transform(m=m, m_inv=jnp.linalg.inv(m))

    @staticmethod
    def translate(delta):
        delta = jnp.asarray(delta, jnp.float32)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[0:3, 3].set(delta)
        mi = jnp.eye(4, dtype=jnp.float32)
        mi = mi.at[0:3, 3].set(-delta)
        return Transform(m=m, m_inv=mi)

    @staticmethod
    def scale(sx, sy, sz):
        s = jnp.array([sx, sy, sz, 1.0], jnp.float32)
        return Transform(m=jnp.diag(s), m_inv=jnp.diag(1.0 / s))

    @staticmethod
    def rotate_axis(theta_deg, axis):
        """Rotation about an arbitrary axis (src/transform.rs rotate)."""
        a = normalize(jnp.asarray(axis, jnp.float32))
        rad = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
        s, c = jnp.sin(rad), jnp.cos(rad)
        x, y, z = a[0], a[1], a[2]
        m = jnp.array(
            [
                [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s, 0.0],
                [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s, 0.0],
                [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c, 0.0],
                [0.0, 0.0, 0.0, 1.0],
            ],
            jnp.float32,
        )
        return Transform(m=m, m_inv=jnp.swapaxes(m, -1, -2))

    @staticmethod
    def rotate_x(theta_deg):
        return Transform.rotate_axis(theta_deg, jnp.array([1.0, 0.0, 0.0]))

    @staticmethod
    def rotate_y(theta_deg):
        return Transform.rotate_axis(theta_deg, jnp.array([0.0, 1.0, 0.0]))

    @staticmethod
    def rotate_z(theta_deg):
        return Transform.rotate_axis(theta_deg, jnp.array([0.0, 0.0, 1.0]))

    @staticmethod
    def rotate_from_to(frm, to):
        """Rotation taking unit vector frm to unit vector to
        (src/transform.rs rotate_from_to, Möller-Hughes)."""
        frm = jnp.asarray(frm, jnp.float32)
        to = jnp.asarray(to, jnp.float32)
        cand = jnp.where(
            (jnp.abs(frm[0]) < 0.72) & (jnp.abs(to[0]) < 0.72),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.where(
                (jnp.abs(frm[1]) < 0.72) & (jnp.abs(to[1]) < 0.72),
                jnp.array([0.0, 1.0, 0.0]),
                jnp.array([0.0, 0.0, 1.0]),
            ),
        )
        u = cand - frm
        v = cand - to
        uu = dot(u, u)
        vv = dot(v, v)
        uv = dot(u, v)
        i = jnp.eye(3, dtype=jnp.float32)
        r = (
            i
            - 2.0 / uu * u[:, None] * u[None, :]
            - 2.0 / vv * v[:, None] * v[None, :]
            + 4.0 * uv / (uu * vv) * v[:, None] * u[None, :]
        )
        m = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(r)
        return Transform(m=m, m_inv=jnp.swapaxes(m, -1, -2))

    @staticmethod
    def look_at(pos, look, up):
        """Camera-to-world transform (src/transform.rs look_at)."""
        pos = jnp.asarray(pos, jnp.float32)
        look = jnp.asarray(look, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        dir_ = normalize(look - pos)
        right = normalize(cross(normalize(up), dir_))
        new_up = cross(dir_, right)
        c2w = jnp.stack(
            [
                jnp.append(right, 0.0),
                jnp.append(new_up, 0.0),
                jnp.append(dir_, 0.0),
                jnp.append(pos, 1.0),
            ],
            axis=-1,
        )
        return Transform(m=c2w, m_inv=jnp.linalg.inv(c2w))

    @staticmethod
    def orthographic(z_near, z_far):
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[2, 2].set(1.0 / (z_far - z_near)).at[2, 3].set(
            -z_near / (z_far - z_near)
        )
        return Transform(m=m, m_inv=jnp.linalg.inv(m))

    @staticmethod
    def perspective(fov_deg, n, f):
        """Perspective projection (src/transform.rs perspective)."""
        persp = jnp.array(
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, f / (f - n), -f * n / (f - n)],
                [0.0, 0.0, 1.0, 0.0],
            ],
            jnp.float32,
        )
        inv_tan = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2.0)
        scale = Transform.scale(inv_tan, inv_tan, 1.0)
        m = scale.m @ persp
        return Transform(m=m, m_inv=jnp.linalg.inv(m))

    # -- composition --

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other — apply ``other`` first."""
        return Transform(m=self.m @ other.m, m_inv=other.m_inv @ self.m_inv)

    def __matmul__(self, other: "Transform") -> "Transform":
        return self.compose(other)

    def inverse(self) -> "Transform":
        return Transform(m=self.m_inv, m_inv=self.m)

    def transpose(self) -> "Transform":
        return Transform(
            m=jnp.swapaxes(self.m, -1, -2), m_inv=jnp.swapaxes(self.m_inv, -1, -2)
        )

    # -- application (batched: p is (..., 3)) --

    def apply_point(self, p):
        ph = _apply44(self.m, p, 1.0)
        w = ph[..., 3]
        xyz = ph[..., :3]
        return jnp.where(
            (w == 1.0)[..., None], xyz, xyz / jnp.where(w == 0.0, 1.0, w)[..., None]
        )

    def apply_vector(self, v):
        return _apply44(self.m, v, 0.0)[..., :3]

    def apply_normal(self, n):
        """Normals transform by the inverse transpose (src/transform.rs)."""
        mi = jnp.swapaxes(self.m_inv, -1, -2)
        return _apply44(mi, n, 0.0)[..., :3]

    def apply_point_inv(self, p):
        ph = _apply44(self.m_inv, p, 1.0)
        w = ph[..., 3]
        xyz = ph[..., :3]
        return jnp.where(
            (w == 1.0)[..., None], xyz, xyz / jnp.where(w == 0.0, 1.0, w)[..., None]
        )

    def apply_vector_inv(self, v):
        return _apply44(self.m_inv, v, 0.0)[..., :3]

    def apply_normal_inv(self, n):
        mt = jnp.swapaxes(self.m, -1, -2)
        return _apply44(mt, n, 0.0)[..., :3]

    def swaps_handedness(self):
        """det of the upper-left 3x3 < 0 (src/transform.rs swaps_handedness)."""
        return jnp.linalg.det(self.m[..., :3, :3]) < 0.0

    def is_identity(self):
        return bool(np.allclose(np.asarray(self.m), np.eye(4)))


def _apply44(m, v, w):
    """Apply (...,4,4) @ [v, w] over batched (...,3) v."""
    vh = jnp.concatenate([v, jnp.full_like(v[..., :1], w)], axis=-1)
    return jnp.einsum("...ij,...j->...i", m, vh)
