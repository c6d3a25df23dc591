"""Map-origin handling: new origin on lost tracking, merging on re-closure
(ref: GCSLAM.cpp:149-161 new origin; :187-254 updateMapOrigin)."""

import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.io import synthetic, tum
from texturefusion_tpu.ops import preprocess
from texturefusion_tpu.slam.gcslam import GCSLAM

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


def test_lost_tracking_starts_new_origin_then_merges():
    poses = synthetic.orbit_trajectory(6)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    slam = GCSLAM(CFG)

    def feed(i, blank=False):
        if blank:
            gray = jnp.zeros((INTR.height, INTR.width))
            depth = jnp.zeros((INTR.height, INTR.width))
        else:
            gray = preprocess.rgb_to_gray(jnp.asarray(rgbs[i])) * 255.0
            depth = jnp.asarray(depths[i])
        return slam.update_frame(gray, depth, timestamp=float(i))

    feed(0)
    feed(1)
    # several blank frames (sensor covered) → forced failures → new origin
    for _ in range(4):
        feed(0, blank=True)
    assert slam.origin_count >= 2, slam.origin_count
    origins_before = {k.origin_index for k in slam.keyframes}
    assert len(origins_before) >= 2

    # camera sees the scene again: loop closure back to origin 0 should
    # merge origins
    for i in range(0, 6):
        feed(i)
    merged = {k.origin_index for k in slam.keyframes}
    # the newest keyframes are all in one origin after merging
    assert 0 in merged
    frames_o0 = [f for f in slam.frames if f.origin_index == 0]
    assert len(frames_o0) > len(slam.frames) // 2
