import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.pipeline import ReconstructionPipeline
from texturefusion_tpu.fusion import dynamics
from texturefusion_tpu.io import synthetic, tum

CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


@pytest.fixture(scope="module")
def seq():
    poses = synthetic.orbit_trajectory(10)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    return poses, depths, rgbs


@pytest.fixture(scope="module")
def ran(seq):
    poses, depths, rgbs = seq
    pipe = ReconstructionPipeline(CFG)
    for i in range(len(poses)):
        pipe.process_frame(jnp.asarray(depths[i]), jnp.asarray(rgbs[i]),
                           timestamp=float(i))
    pipe.finish()
    return pipe


def test_pipeline_end_to_end(ran, seq):
    poses, depths, rgbs = seq
    pipe = ran
    assert pipe.stats["frames"] == 10
    assert pipe.stats["keyframes"] >= 1
    est = pipe.trajectory()
    rmse = tum.ate_rmse(est, np.stack(poses))
    assert rmse < 0.02, rmse
    assert pipe.volume.n_active() > 10


def test_pipeline_mesh_quality(ran, seq):
    poses, depths, rgbs = seq
    verts, faces, colors, normals = ran.mesher.full_mesh()
    assert len(verts) > 500
    # SLAM bootstraps keyframe 0 at identity → the map lives in frame-0
    # camera coordinates; bring vertices back to world for the analytic
    # comparison
    verts_w = verts @ poses[0][:3, :3].T + poses[0][:3, 3]
    sdf = np.abs(np.asarray(SCENE.sdf(jnp.asarray(verts_w))))
    assert np.median(sdf) < CFG.tsdf.voxel_resolution, np.median(sdf)


def test_pipeline_exports(ran, tmp_path):
    mesh_path = str(tmp_path / "mesh.ply")
    traj_path = str(tmp_path / "traj.txt")
    n = ran.export_mesh(mesh_path)
    assert n > 0
    ran.save_trajectory(traj_path)
    lines = open(traj_path).read().strip().splitlines()
    assert len(lines) == 10
    assert len(lines[0].split()) == 8


def test_drift_selection():
    costs = np.asarray([0.0, 0.0, 5e-4, 6e-4, 0.0, 0.0, 2e-3, 0.0])
    picked = dynamics.select_keyframes_to_update(costs, max_updates=2)
    assert len(picked) <= 2
    assert 6 in picked or 5 in picked or 7 in picked  # window smears peak
    low = dynamics.select_keyframes_to_update(np.full(5, 1e-6), max_updates=3)
    assert low == []


def test_observations_recorded_for_texture(ran):
    # keyframe observations must exist for the MRF data costs
    n_obs = sum(len(v) for v in ran.volume.observations.values())
    assert n_obs > 0


def test_async_fusion_matches_sync(seq):
    from texturefusion_tpu.config import ParallelConfig
    poses, depths, rgbs = seq
    cfg = CFG.replace(parallel=ParallelConfig(async_fusion=True))
    pipe = ReconstructionPipeline(cfg)
    for i in range(len(poses)):
        pipe.process_frame(jnp.asarray(depths[i]), jnp.asarray(rgbs[i]),
                           timestamp=float(i))
    pipe.finish()
    est = pipe.trajectory()
    rmse = tum.ate_rmse(est, np.stack(poses))
    assert rmse < 0.02, rmse
    verts, faces, colors, normals = pipe.mesher.full_mesh()
    assert len(verts) > 500
    verts_w = verts @ poses[0][:3, :3].T + poses[0][:3, 3]
    sdf = np.abs(np.asarray(SCENE.sdf(jnp.asarray(verts_w))))
    assert np.median(sdf) < CFG.tsdf.voxel_resolution


def test_reintegration_restores_mesh_after_pose_correction(seq):
    """Pipeline-level drift→retract→de-integrate→re-integrate cycle
    (ref: MobileFusion.cpp:289-315 + ReIntegrateKeyframe :114-221):
    integrate a keyframe at a WRONG pose, correct the pose (as BA would),
    run a fusion cycle, and assert the reintegration fired and the mesh
    snapped back to the surface it would have had with the right pose."""
    poses, depths, rgbs = seq
    pipe = ReconstructionPipeline(CFG)
    # frame 0 bootstraps keyframe 0 at identity; inject a perturbed pose
    pipe.process_frame(jnp.asarray(depths[0]), jnp.asarray(rgbs[0]),
                       timestamp=0.0)
    pipe.flush_tracking()
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] += np.asarray([0.12, -0.06, 0.1], np.float32)  # 17 cm off
    pipe.slam.poses[0] = bad
    pipe.fusion_cycle(0)                # integrates kf0 at the BAD pose
    st = pipe.kf_states[0]
    assert st.integrated
    np.testing.assert_allclose(st.integrated_pose, bad)

    # BA "corrects" the pose back to ground truth
    pipe.slam.poses[0] = np.eye(4, dtype=np.float32)
    pipe.fusion_cycle(0)                # drift cost >> 1e-4 → reintegrate
    assert pipe.stats["reintegrations"] >= 1, \
        "drift above threshold did not trigger reintegration"
    np.testing.assert_allclose(st.integrated_pose,
                               np.eye(4, dtype=np.float32))

    # the mesh must now match a fresh pipeline that integrated at the
    # correct pose from the start
    ref = ReconstructionPipeline(CFG)
    ref.process_frame(jnp.asarray(depths[0]), jnp.asarray(rgbs[0]),
                      timestamp=0.0)
    ref.flush_tracking()
    ref.fusion_cycle(0)
    v_fix, _, _, _ = pipe.mesher.full_mesh()
    v_ref, _, _, _ = ref.mesher.full_mesh()
    assert len(v_ref) > 50
    # compare centroid + bounds (vertex ORDER may differ across chunk
    # sets; the surfaces must coincide)
    np.testing.assert_allclose(v_fix.mean(0), v_ref.mean(0), atol=0.02)
    np.testing.assert_allclose(
        np.percentile(v_fix, [5, 95], axis=0),
        np.percentile(v_ref, [5, 95], axis=0), atol=0.05)
    # and the de-integration really cleared the bad-pose surface: voxel
    # mass matches the reference run (no ghost geometry)
    w_fix = float(jnp.sum(jnp.abs(pipe.volume.batch.weight)))
    w_ref = float(jnp.sum(jnp.abs(ref.volume.batch.weight)))
    assert abs(w_fix - w_ref) / max(w_ref, 1.0) < 0.05
