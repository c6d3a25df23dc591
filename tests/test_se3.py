import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from texturefusion_tpu.core import se3


def random_twists(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(1)
    omega = rng.standard_normal((64, 3)).astype(np.float32)
    ours = np.asarray(se3.so3_exp(jnp.asarray(omega)))
    ref = Rotation.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_so3_exp_log_roundtrip():
    omega = random_twists(128, scale=1.5)[:, :3]
    rot = se3.so3_exp(jnp.asarray(omega))
    back = np.asarray(se3.so3_log(rot))
    # Compare as rotations (log may differ by 2π wrapping for |ω|>π)
    ref = Rotation.from_rotvec(omega)
    got = Rotation.from_rotvec(back)
    delta = (ref.inv() * got).magnitude()
    assert np.max(delta) < 1e-4


def test_so3_log_small_angle():
    omega = random_twists(16, scale=1e-6)[:, :3]
    rot = se3.so3_exp(jnp.asarray(omega))
    back = np.asarray(se3.so3_log(rot))
    np.testing.assert_allclose(back, omega, atol=1e-7)


def test_se3_exp_log_roundtrip():
    xi = random_twists(64, scale=0.8)
    pose = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(pose))
    np.testing.assert_allclose(back, xi, atol=2e-4)


def test_se3_exp_identity():
    pose = np.asarray(se3.se3_exp(jnp.zeros(6)))
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-7)


def test_inverse_compose():
    xi = random_twists(32, scale=0.5)
    pose = se3.se3_exp(jnp.asarray(xi))
    ident = np.asarray(se3.compose(pose, se3.inverse(pose)))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), (32, 4, 4)), atol=1e-5)


def test_transform_points():
    xi = random_twists(1, scale=0.5)[0]
    pose = se3.se3_exp(jnp.asarray(xi))
    pts = np.random.default_rng(2).standard_normal((10, 3)).astype(np.float32)
    ours = np.asarray(se3.transform_points(pose, jnp.asarray(pts)))
    p = np.asarray(pose)
    ref = pts @ p[:3, :3].T + p[:3, 3]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(3)
    omega = rng.standard_normal((64, 3)).astype(np.float32)
    rot = se3.so3_exp(jnp.asarray(omega))
    q = se3.quaternion_from_matrix(rot)
    ref_q = Rotation.from_matrix(np.asarray(rot)).as_quat()  # scipy is (x,y,z,w)
    # quaternions are double covers: q and -q equal
    dots = np.abs(np.sum(np.asarray(q) * ref_q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    back = np.asarray(se3.matrix_from_quaternion(q))
    np.testing.assert_allclose(back, np.asarray(rot), atol=1e-5)


def test_pose_distance_zero_for_equal():
    xi = random_twists(8, scale=0.5)
    pose = se3.se3_exp(jnp.asarray(xi))
    d = np.asarray(se3.pose_distance(pose, pose))
    np.testing.assert_allclose(d, 0.0, atol=1e-8)


def test_pose_distance_positive():
    a = se3.se3_exp(jnp.asarray(random_twists(8, 0.5, seed=4)))
    b = se3.se3_exp(jnp.asarray(random_twists(8, 0.5, seed=5)))
    d = np.asarray(se3.pose_distance(a, b))
    assert np.all(d > 0)
