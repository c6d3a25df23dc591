import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam, se3
from texturefusion_tpu.io import synthetic
from texturefusion_tpu.ops import hamming, preprocess
from texturefusion_tpu.slam import features
from texturefusion_tpu.slam.matching import kabsch, refine_pose_gn, register_frames

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


@pytest.fixture(scope="module")
def seq():
    poses = synthetic.orbit_trajectory(4)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    return poses, depths, rgbs


def _extract(depth, rgb):
    gray = preprocess.rgb_to_gray(jnp.asarray(rgb)) * 255.0
    return features.extract_features(gray, jnp.asarray(depth),
                                     CFG.tracking, INTR)


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (5, 256)).astype(bool)
    packed = np.asarray(hamming.pack_bits(jnp.asarray(bits)))
    assert packed.shape == (5, 8)
    unpacked = ((packed[:, :, None] >> np.arange(32)[None, None]) & 1).reshape(5, 256)
    np.testing.assert_array_equal(unpacked.astype(bool), bits)


def test_hamming_matrix_exact():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (6, 8), dtype=np.uint32)
    d = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    expect = np.zeros((4, 6), np.int32)
    for i in range(4):
        for j in range(6):
            x = a[i] ^ b[j]
            expect[i, j] = sum(bin(int(v)).count("1") for v in x)
    np.testing.assert_array_equal(d, expect)


def test_feature_extraction_finds_corners(seq):
    poses, depths, rgbs = seq
    kp = _extract(depths[0], rgbs[0])
    n_valid = int(np.asarray(kp.valid).sum())
    assert n_valid > 100, n_valid
    n_3d = int(np.asarray(kp.has_depth).sum())
    assert n_3d > 80
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert uv[:, 0].max() < INTR.width and uv[:, 1].max() < INTR.height
    # descriptors should differ between keypoints
    desc = np.asarray(kp.desc)[np.asarray(kp.valid)]
    assert len(np.unique(desc, axis=0)) > 0.5 * len(desc)


def test_descriptors_match_across_frames(seq):
    poses, depths, rgbs = seq
    kp0 = _extract(depths[0], rgbs[0])
    kp1 = _extract(depths[1], rgbs[1])
    idx, dist, ok = hamming.match_descriptors(
        kp1.desc, kp1.valid, kp0.desc, kp0.valid, CFG.tracking.hamming_threshold)
    assert int(np.asarray(ok).sum()) > 50


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(2)
    q = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    xi = np.asarray([0.1, -0.2, 0.05, 0.2, -0.1, 0.15], np.float32)
    t_true = se3.se3_exp(jnp.asarray(xi))
    p = se3.transform_points(t_true, jnp.asarray(q))
    t_est = kabsch(p, jnp.asarray(q), jnp.ones(50))
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_true), atol=1e-5)


def test_gn_refines_under_outliers():
    rng = np.random.default_rng(3)
    q = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    xi = np.asarray([0.05, 0.02, -0.03, 0.1, 0.05, -0.08], np.float32)
    t_true = se3.se3_exp(jnp.asarray(xi))
    p = np.asarray(se3.transform_points(t_true, jnp.asarray(q))).copy()
    p[:10] += rng.uniform(0.5, 1.0, (10, 3))  # gross outliers
    p += rng.normal(0, 0.001, p.shape)        # noise
    t0 = se3.identity()
    t_est = refine_pose_gn(t0, jnp.asarray(p.astype(np.float32)), jnp.asarray(q),
                           jnp.ones(100), 10, 0.008)
    err = np.asarray(se3.pose_distance(t_est, t_true))
    assert err < 1e-4, err


def test_two_view_registration_recovers_gt(seq):
    poses, depths, rgbs = seq
    kp0 = _extract(depths[0], rgbs[0])
    kp1 = _extract(depths[1], rgbs[1])
    res = register_frames(kp0, kp1, jax.random.PRNGKey(0), CFG.tracking, INTR)
    assert bool(res.success), (int(res.n_inliers), float(res.mean_error))
    # ground-truth relative pose: p_0 = T · p_1 with T = inv(pose0) · pose1
    t_gt = se3.compose(se3.inverse(jnp.asarray(poses[0])), jnp.asarray(poses[1]))
    t_est = res.pose
    delta = np.asarray(se3.se3_log(se3.compose(se3.inverse(t_est), t_gt)))
    trans_err = np.linalg.norm(delta[:3])
    rot_err = np.linalg.norm(delta[3:])
    assert trans_err < 0.02, (trans_err, rot_err)
    assert rot_err < 0.02, (trans_err, rot_err)


def test_two_view_identity(seq):
    poses, depths, rgbs = seq
    kp0 = _extract(depths[0], rgbs[0])
    res = register_frames(kp0, kp0, jax.random.PRNGKey(1), CFG.tracking, INTR)
    assert bool(res.success)
    delta = np.asarray(se3.se3_log(res.pose))
    assert np.linalg.norm(delta) < 1e-3
    assert float(res.disparity) < 1e-3
