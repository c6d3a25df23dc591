import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam, se3
from texturefusion_tpu.io import synthetic, tum
from texturefusion_tpu.ops import preprocess
from texturefusion_tpu.slam.gcslam import GCSLAM

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


@pytest.fixture(scope="module")
def seq():
    poses = synthetic.orbit_trajectory(10)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    return poses, depths, rgbs


def _run_slam(poses, depths, rgbs):
    slam = GCSLAM(CFG)
    for i in range(len(poses)):
        gray = preprocess.rgb_to_gray(jnp.asarray(rgbs[i])) * 255.0
        slam.update_frame(gray, jnp.asarray(depths[i]), timestamp=float(i))
    return slam


def test_tracking_trajectory_ate(seq):
    poses, depths, rgbs = seq
    slam = _run_slam(poses, depths, rgbs)
    assert len(slam.frames) == 10
    assert all(f.tracking_success for f in slam.frames), \
        [f.tracking_success for f in slam.frames]
    assert slam.origin_count == 1
    est = slam.trajectory()
    gt = np.stack(poses)
    rmse = tum.ate_rmse(est, gt)
    assert rmse < 0.02, rmse


def test_keyframe_promotion_happens(seq):
    poses, depths, rgbs = seq
    slam = _run_slam(poses, depths, rgbs)
    # the orbit covers enough parallax that more than one keyframe exists
    assert 1 <= len(slam.keyframes) <= 10
    # every frame attaches to a keyframe
    for f in slam.frames:
        assert 0 <= f.keyframe_slot < len(slam.keyframes)


def test_edges_and_ba_ran(seq):
    poses, depths, rgbs = seq
    slam = _run_slam(poses, depths, rgbs)
    if len(slam.keyframes) > 1:
        assert slam.n_edges >= len(slam.keyframes) - 1
        assert slam.last_ba_errors, "BA never ran despite multiple keyframes"
        e0, e1 = slam.last_ba_errors[-1]
        assert e1 <= e0 * CFG.ba.rollback_error_growth + 1e-9


def test_static_camera_single_keyframe(seq):
    poses, depths, rgbs = seq
    slam = GCSLAM(CFG)
    gray = preprocess.rgb_to_gray(jnp.asarray(rgbs[0])) * 255.0
    d = jnp.asarray(depths[0])
    for i in range(4):
        slam.update_frame(gray, d, timestamp=float(i))
    # no parallax → no keyframe promotion beyond bootstrap
    assert len(slam.keyframes) == 1
    est = slam.trajectory()
    # all poses ≈ identity
    for p in est:
        assert np.abs(p - np.eye(4)).max() < 1e-2
