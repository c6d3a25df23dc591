import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.io import synthetic
from texturefusion_tpu.ops import raycast

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


@pytest.fixture(scope="module")
def fused_volume():
    poses = synthetic.orbit_trajectory(3)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    vol = TSDFVolume(CFG)
    for p, d, c in zip(poses, depths, rgbs):
        vol.integrate_frame(jnp.asarray(d), jnp.asarray(c),
                            jnp.zeros_like(jnp.asarray(d)), jnp.asarray(p),
                            keyframe_id=0)
    return vol, poses, depths, rgbs


def test_raycast_matches_input_depth(fused_volume):
    vol, poses, depths, rgbs = fused_volume
    res = raycast.raycast_volume(vol, poses[0])
    hit = np.asarray(res.hit)
    d_ray = np.asarray(res.depth)
    d_in = depths[0]
    both = hit & (d_in > 0)
    assert both.mean() > 0.5, both.mean()
    err = np.abs(d_ray[both] - d_in[both])
    assert np.median(err) < CFG.tsdf.voxel_resolution, np.median(err)


def test_raycast_normals_unit_and_facing(fused_volume):
    vol, poses, depths, rgbs = fused_volume
    res = raycast.raycast_volume(vol, poses[0])
    hit = np.asarray(res.hit)
    n = np.asarray(res.normals)[hit]
    norms = np.linalg.norm(n, axis=-1)
    assert (np.abs(norms - 1.0) < 1e-3).mean() > 0.95
    # visible surfaces must not face away from the camera (grazing walls
    # legitimately give cos ≈ 0)
    rot = poses[0][:3, :3]
    view_w = rot @ np.asarray([0, 0, 1.0])
    cos = n @ view_w
    assert (cos < 0.5).mean() > 0.9, (cos < 0.5).mean()


def test_raycast_colors_populated(fused_volume):
    vol, poses, depths, rgbs = fused_volume
    res = raycast.raycast_volume(vol, poses[0])
    hit = np.asarray(res.hit)
    col = np.asarray(res.color)[hit]
    assert col.max() > 0.2
    # rendered color should correlate with the input image color
    cin = rgbs[0][hit]
    corr = np.corrcoef(col.mean(-1), cin.mean(-1))[0, 1]
    assert corr > 0.5, corr
