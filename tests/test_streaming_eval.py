import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.eval import loop_closure as lc
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.fusion.streaming import ChunkStreamer
from texturefusion_tpu.io import synthetic

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)


def test_streaming_offload_restore_roundtrip():
    scene = synthetic.BoxRoomScene()
    pose = jnp.asarray(synthetic.orbit_trajectory(1)[0])
    depth, rgb = synthetic.render_frame(scene, INTR, pose)
    vol = TSDFVolume(CFG)
    vol.integrate_frame(depth, rgb, jnp.zeros_like(depth), pose, keyframe_id=0)
    n0 = vol.n_active()
    sdf0 = np.asarray(vol.batch.sdf).copy()
    ids0 = vol.ids.copy()
    act0 = vol.active_slots()
    id_by_slot = {s: tuple(ids0[s]) for s in act0.tolist()}
    sdf_by_id = {id_by_slot[s]: sdf0[s] for s in act0.tolist()}

    streamer = ChunkStreamer(vol, max_resident=8, offload_radius=0.0)
    camera_pos = np.asarray(pose)[:3, 3]
    n_off = streamer.offload_cold(camera_pos)
    assert n_off == n0  # radius 0 offloads everything
    assert vol.n_active() == 0
    assert streamer.n_cold() == n0

    # restore a subset
    restore_ids = np.asarray(list(sdf_by_id.keys())[:5], np.int32)
    n_res = streamer.ensure_resident(restore_ids)
    assert n_res == 5
    assert vol.n_active() == 5
    for cid in map(tuple, restore_ids.tolist()):
        s = vol.slot_of[cid]
        np.testing.assert_array_equal(np.asarray(vol.batch.sdf[s]),
                                      sdf_by_id[cid])
    assert streamer.n_cold() == n0 - 5


def test_streaming_budget_evicts_farthest():
    vol = TSDFVolume(CFG)
    ids = np.asarray([[i, 0, 0] for i in range(20)], np.int32)
    slots = vol.allocate(ids)
    vol.batch = vol.batch._replace(
        weight=vol.batch.weight.at[jnp.asarray(slots)].set(1.0))
    streamer = ChunkStreamer(vol, max_resident=10, offload_radius=1e9)
    n = streamer.offload_cold(np.zeros(3))
    assert n == 10
    # nearest chunks (small x) remain resident
    remaining = sorted(vol.ids[vol.active_slots()][:, 0].tolist())
    assert remaining == list(range(10))


def test_loop_closure_eval():
    import jax.numpy as jnp
    from texturefusion_tpu.core import se3
    poses = [np.asarray(se3.se3_exp(jnp.asarray(
        np.asarray([0.1 * k, 0, 0, 0, 0, 0], np.float32)))) for k in range(6)]
    # all poses within 1m → every non-adjacent pair is a true loop
    truth = lc.ground_truth_pairs(np.stack(poses), trans_thresh=1.0)
    assert (0, 2) in truth and (0, 5) in truth
    res = lc.precision_recall([(0, 2), (0, 5), (1, 3)], truth)
    assert res["precision"] == 1.0
    assert 0 < res["recall"] <= 1.0
    res2 = lc.precision_recall([(0, 99)], truth)
    assert res2["precision"] == 0.0
