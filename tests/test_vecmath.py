"""Math substrate tests — mirrors the reference's heaviest-tested layer
(vecmath/transform unit tests, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.ops import math as sm
from shimmer_tpu.ops import vecmath as vm
from shimmer_tpu.ops.transform import Transform


class TestVecmath:
    def test_dot_cross_orthogonal(self, rng):
        a = rng.standard_normal((64, 3)).astype(np.float32)
        b = rng.standard_normal((64, 3)).astype(np.float32)
        c = vm.cross(a, b)
        np.testing.assert_allclose(vm.dot(c, a), 0.0, atol=1e-4)
        np.testing.assert_allclose(vm.dot(c, b), 0.0, atol=1e-4)

    def test_normalize(self, rng):
        v = rng.standard_normal((32, 3)).astype(np.float32)
        n = vm.normalize(v)
        np.testing.assert_allclose(vm.length(n), 1.0, atol=1e-5)
        # zero vector stays finite
        z = vm.normalize(jnp.zeros((3,)))
        assert np.all(np.isfinite(np.asarray(z)))

    def test_coordinate_system_orthonormal(self, rng):
        v = vm.normalize(rng.standard_normal((128, 3)).astype(np.float32))
        x, y = vm.coordinate_system(v)
        np.testing.assert_allclose(vm.dot(x, v), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(y, v), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(x, y), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(x), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vm.cross(x, y)), np.asarray(v), atol=1e-4
        )

    def test_face_forward(self):
        n = vm.vec(0.0, 0.0, 1.0)
        v = vm.vec(0.0, 0.0, -1.0)
        np.testing.assert_allclose(np.asarray(vm.face_forward(n, v)), [0, 0, -1])

    def test_angle_between(self):
        a = vm.vec(1.0, 0.0, 0.0)
        b = vm.vec(0.0, 1.0, 0.0)
        assert np.isclose(float(vm.angle_between(a, b)), np.pi / 2, atol=1e-6)
        # tiny angles are stable
        c = vm.normalize(vm.vec(1.0, 1e-4, 0.0))
        assert np.isclose(float(vm.angle_between(a, c)), 1e-4, rtol=1e-3)

    def test_frame_roundtrip(self, rng):
        z = vm.normalize(rng.standard_normal((16, 3)).astype(np.float32))
        f = vm.Frame.from_z(z)
        v = vm.normalize(rng.standard_normal((16, 3)).astype(np.float32))
        local = f.to_local(v)
        back = f.from_local(local)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_spherical_direction_roundtrip(self):
        theta = jnp.array([0.3, 1.2, 2.8])
        phi = jnp.array([0.1, 3.0, 5.5])
        d = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
        np.testing.assert_allclose(np.asarray(vm.spherical_theta(d)), theta, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.spherical_phi(d)), phi, atol=1e-4)

    def test_spherical_triangle_area_octant(self):
        a = vm.vec(1.0, 0.0, 0.0)
        b = vm.vec(0.0, 1.0, 0.0)
        c = vm.vec(0.0, 0.0, 1.0)
        area = float(vm.spherical_triangle_area(a, b, c))
        assert np.isclose(area, 4.0 * np.pi / 8.0, atol=1e-5)

    def test_equal_area_mapping_roundtrip(self, rng):
        p = rng.uniform(0.02, 0.98, (256, 2)).astype(np.float32)
        d = vm.equal_area_square_to_sphere(jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-4)
        p2 = vm.equal_area_sphere_to_square(d)
        np.testing.assert_allclose(np.asarray(p2), p, atol=1e-3)


class TestMath:
    def test_quadratic(self):
        has, t0, t1 = sm.quadratic(
            jnp.array([1.0, 1.0, 0.0, 1.0]),
            jnp.array([-3.0, 0.0, 2.0, 0.0]),
            jnp.array([2.0, 1.0, -4.0, 1.0]),
        )
        assert list(np.asarray(has)) == [True, False, True, False]
        assert np.isclose(float(t0[0]), 1.0) and np.isclose(float(t1[0]), 2.0)
        assert np.isclose(float(t0[2]), 2.0)

    def test_find_interval(self):
        xs = jnp.array([0.0, 1.0, 2.0, 3.0])
        x = jnp.array([-1.0, 0.5, 1.0, 2.9, 3.5])
        np.testing.assert_array_equal(np.asarray(sm.find_interval(xs, x)), [0, 0, 1, 2, 2])

    def test_difference_of_products_catastrophic(self):
        # values chosen to cancel catastrophically in naive f32
        a = jnp.float32(33962.035)
        b = jnp.float32(-30438.8)
        c = jnp.float32(41563.4)
        d = jnp.float32(-24871.969)
        ref = float(np.float64(a) * np.float64(b) - np.float64(c) * np.float64(d))
        got = float(sm.difference_of_products(a, b, c, d))
        naive = float(a * b - c * d)
        assert abs(got - ref) <= abs(naive - ref)

    def test_lerp_sinc(self):
        assert float(sm.lerp(0.5, 2.0, 4.0)) == 3.0
        assert np.isclose(float(sm.sinc(jnp.array(0.0))), 1.0)
        assert np.isclose(float(sm.sinc(jnp.array(1.0))), 0.0, atol=1e-6)


class TestTransform:
    def test_translate_point_vs_vector(self):
        t = Transform.translate(jnp.array([1.0, 2.0, 3.0]))
        p = vm.vec(0.0, 0.0, 0.0)
        v = vm.vec(1.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(t.apply_point(p)), [1, 2, 3])
        np.testing.assert_allclose(np.asarray(t.apply_vector(v)), [1, 0, 0])

    def test_inverse_roundtrip(self, rng):
        t = Transform.look_at(
            jnp.array([1.0, 2.0, 3.0]), jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
        )
        p = rng.standard_normal((10, 3)).astype(np.float32)
        q = t.apply_point_inv(t.apply_point(jnp.asarray(p)))
        np.testing.assert_allclose(np.asarray(q), p, atol=1e-4)

    def test_rotate(self):
        t = Transform.rotate_z(90.0)
        p = t.apply_point(vm.vec(1.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)

    def test_normal_transform_stays_perpendicular(self):
        t = Transform.scale(1.0, 2.0, 4.0)
        # surface tangent and normal
        tang = vm.vec(0.0, 1.0, -1.0)  # perpendicular to n below
        n = vm.vec(0.0, 1.0, 1.0)
        assert np.isclose(float(vm.dot(tang, n)), 0.0)
        tang2 = t.apply_vector(tang)
        n2 = t.apply_normal(n)
        assert np.isclose(float(vm.dot(tang2, n2)), 0.0, atol=1e-5)

    def test_compose(self):
        a = Transform.translate(jnp.array([1.0, 0.0, 0.0]))
        b = Transform.rotate_z(90.0)
        ab = a @ b  # rotate then translate
        p = ab.apply_point(vm.vec(1.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(p), [1, 1, 0], atol=1e-6)

    def test_swaps_handedness(self):
        assert bool(Transform.scale(-1.0, 1.0, 1.0).swaps_handedness())
        assert not bool(Transform.scale(1.0, 1.0, 1.0).swaps_handedness())

    def test_rotate_from_to(self, rng):
        for _ in range(5):
            f = vm.normalize(jnp.asarray(rng.standard_normal(3), jnp.float32))
            t = vm.normalize(jnp.asarray(rng.standard_normal(3), jnp.float32))
            r = Transform.rotate_from_to(f, t)
            np.testing.assert_allclose(
                np.asarray(r.apply_vector(f)), np.asarray(t), atol=1e-5
            )

    def test_perspective(self):
        t = Transform.perspective(90.0, 1e-2, 1000.0)
        # at fov 90, x == z maps to screen x' == 1
        p = t.apply_point(vm.vec(1.0, 0.0, 1.0))
        assert np.isclose(float(p[0]), 1.0, atol=1e-5)
