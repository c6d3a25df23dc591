import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.io import synthetic
from texturefusion_tpu.ops import preprocess, raycast

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


def test_devignette_center_preserved():
    rgb = jnp.ones((INTR.height, INTR.width, 3)) * 0.5
    out = np.asarray(preprocess.devignette(rgb, INTR))
    cy, cx = INTR.height // 2, INTR.width // 2
    assert abs(out[cy, cx, 0] - 0.5) < 0.01
    # corners gain brightness
    assert out[0, 0, 0] > out[cy, cx, 0]


def test_remove_boundary_depth():
    d = np.full((32, 32), 2.0, np.float32)
    d[:, 16:] = 1.0   # sharp discontinuity at column 16
    out = np.asarray(preprocess.remove_boundary_depth(jnp.asarray(d)))
    # pixels at the jump get removed; interiors survive
    assert (out[:, 14:18] == 0).any()
    assert (out[:, :8] > 0).all()
    assert (out[:, 24:] > 0).all()


def test_refine_depth_to_isosurface():
    poses = synthetic.orbit_trajectory(3)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    vol = TSDFVolume(CFG)
    for p, d, c in zip(poses, depths, rgbs):
        vol.integrate_frame(jnp.asarray(d), None, None, jnp.asarray(p))
    table = vol._slot_table()
    # perturb the input depth and snap it back to the fused isosurface
    noisy = jnp.asarray(depths[0]) * 1.01
    refined = raycast.refine_depth_to_isosurface(
        vol.batch.sdf, vol.batch.weight, table.table, table.lo, table.trash,
        noisy, jnp.asarray(poses[0]), INTR, CFG.tsdf)
    refined = np.asarray(refined)
    valid = (depths[0] > 0) & (refined > 0)
    err_noisy = np.abs(noisy * 1.0 - depths[0])[valid]
    err_ref = np.abs(refined - depths[0])[valid]
    assert np.median(err_ref) < np.median(np.asarray(err_noisy)) * 0.5
