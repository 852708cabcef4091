"""Unit tests for SO(3)/quaternion math against independent references.

Reference values come from scipy.spatial.transform.Rotation and hand-rolled
numpy — independent implementations, not the reference repo's code.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax.numpy as jnp

from poet_tpu.utils import quaternions as Q
from poet_tpu.utils import rotations as R


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=np.random.RandomState(0)).as_matrix()


class TestRotation6d:
    def test_produces_valid_rotations(self, rng):
        r6 = rng.normal(size=(32, 6)).astype(np.float32)
        mats = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(r6)))
        eye = np.einsum("nij,nkj->nik", mats, mats)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-5)

    def test_gram_schmidt_structure(self, rng):
        """Column 0 is normalize(m1); col 2 ⟂ m1, m2; col 1 completes RH frame."""
        r6 = rng.normal(size=(8, 6)).astype(np.float64)
        mats = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(r6)))
        m1 = r6[:, :3] / np.linalg.norm(r6[:, :3], axis=1, keepdims=True)
        np.testing.assert_allclose(mats[:, :, 0], m1, atol=1e-6)
        # z orthogonal to both m1 and m2
        dots = np.einsum("ni,ni->n", mats[:, :, 2], r6[:, 3:])
        np.testing.assert_allclose(dots, 0.0, atol=1e-6)

    def test_roundtrip_from_rotation(self):
        """A rotation's first two columns as 6D input must reproduce it."""
        mats = random_rotations(None, 16)
        r6 = np.concatenate([mats[:, :, 0], mats[:, :, 1]], axis=1)
        rec = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(r6)))
        # x = col0; z = x × col1 = col2 for a right-handed rotation... but note
        # Gram-Schmidt gives [x, z×x, x×m2] layout, check reconstruction:
        np.testing.assert_allclose(rec, mats, atol=1e-6)


class TestSO3Maps:
    def test_exp_log_roundtrip(self, rng):
        v = rng.normal(size=(64, 3)).astype(np.float64)
        # Stay away from the π singularity
        v = v / np.linalg.norm(v, axis=1, keepdims=True) * rng.uniform(0.1, 3.0, size=(64, 1))
        mats = np.asarray(R.so3_exp_map(jnp.asarray(v)))
        expected = ScipyRot.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(mats, expected, atol=1e-6)
        back = np.asarray(R.so3_log_map(jnp.asarray(mats)))
        np.testing.assert_allclose(back, v, atol=1e-4)

    def test_log_map_small_angle(self):
        v = np.array([[1e-5, -2e-5, 1.5e-5]], dtype=np.float64)
        mats = ScipyRot.from_rotvec(v).as_matrix()
        out = np.asarray(R.so3_log_map(jnp.asarray(mats)))
        assert np.all(np.isfinite(out))

    def test_rotation_angle(self):
        angles = np.array([0.05, 0.5, 1.5, 3.0])
        axes = np.tile(np.array([[0.0, 0.0, 1.0]]), (4, 1))
        mats = ScipyRot.from_rotvec(axes * angles[:, None]).as_matrix()
        out = np.asarray(R.so3_rotation_angle(jnp.asarray(mats)))
        np.testing.assert_allclose(out, angles, atol=1e-4)

    def test_hat_hat_inv(self, rng):
        v = rng.normal(size=(10, 3))
        h = np.asarray(R.hat(jnp.asarray(v)))
        np.testing.assert_allclose(h, -np.swapaxes(h, -1, -2), atol=1e-12)
        back = np.asarray(R.hat_inv(jnp.asarray(h)))
        np.testing.assert_allclose(back, v, atol=1e-12)


class TestAcosExtrapolation:
    def test_inside_matches_acos(self):
        x = np.linspace(-0.999, 0.999, 101)
        out = np.asarray(R.acos_linear_extrapolation(jnp.asarray(x)))
        np.testing.assert_allclose(out, np.arccos(x), atol=1e-6)

    def test_outside_is_finite_and_linear(self):
        x = jnp.asarray([-1.5, -1.0, 1.0, 1.5])
        out = np.asarray(R.acos_linear_extrapolation(x))
        assert np.all(np.isfinite(out))
        # gradient finite too
        import jax

        g = jax.grad(lambda t: R.acos_linear_extrapolation(t).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestGeodesic:
    def test_geodesic_distance(self):
        # arccos near trace=3 is ill-conditioned in f32 (matches torch's f32
        # behavior); identical rotations must give a small, finite distance.
        mats = random_rotations(None, 8)
        d = np.asarray(R.geodesic_distance(jnp.asarray(mats), jnp.asarray(mats)))
        assert np.all(np.isfinite(d)) and np.all(d >= 0) and np.all(d < 0.1)

        r1 = ScipyRot.from_euler("z", 0.7).as_matrix()[None]
        r2 = np.eye(3)[None]
        d = np.asarray(R.geodesic_distance(jnp.asarray(r1), jnp.asarray(r2)))
        np.testing.assert_allclose(d, 0.7, atol=1e-4)

    def test_rotation_error_deg(self):
        r1 = ScipyRot.from_euler("y", np.deg2rad(30)).as_matrix()[None]
        r2 = np.eye(3)[None]
        d = np.asarray(R.rotation_error_deg(jnp.asarray(r1), jnp.asarray(r2)))
        np.testing.assert_allclose(d, 30.0, atol=1e-3)


class TestQuaternions:
    def test_quat2rot_matches_scipy(self, rng):
        q = rng.normal(size=(32, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        out = np.asarray(Q.quat2rot(jnp.asarray(q)))
        # scipy uses (x, y, z, w)
        expected = ScipyRot.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_rot2quat_roundtrip(self):
        mats = random_rotations(None, 32)
        q = np.asarray(Q.rot2quat(jnp.asarray(mats)))
        assert np.all(q[:, 0] >= 0)
        back = np.asarray(Q.quat2rot(jnp.asarray(q)))
        np.testing.assert_allclose(back, mats, atol=1e-5)

    def test_quat_mult_inverse(self, rng):
        q = rng.normal(size=(8, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        prod = np.asarray(Q.quat_mult(jnp.asarray(q), Q.quat_inverse(jnp.asarray(q))))
        expected = np.tile(np.array([1.0, 0, 0, 0]), (8, 1))
        np.testing.assert_allclose(prod, expected, atol=1e-6)
