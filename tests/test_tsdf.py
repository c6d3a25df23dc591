import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.io import synthetic
from texturefusion_tpu.ops import preprocess, tsdf as tsdf_ops


CFG = tiny_test_config()
INTR = cam.Intrinsics.from_config(CFG.camera)
SCENE = synthetic.BoxRoomScene()


@pytest.fixture(scope="module")
def frames():
    poses = synthetic.orbit_trajectory(3)
    depths, rgbs = synthetic.render_sequence(SCENE, INTR, poses)
    return poses, depths, rgbs


def test_truncation_distance_formula():
    cfg = CFG.tsdf
    z = jnp.asarray([1.0, 2.0])
    t = np.asarray(tsdf_ops.truncation_distance(z, cfg))
    expected = np.abs(cfg.truncation_quad * np.array([1.0, 4.0])
                      + cfg.truncation_linear * np.array([1.0, 2.0])
                      + cfg.truncation_const) * cfg.truncation_scale
    np.testing.assert_allclose(t, expected, rtol=1e-6)


def test_candidate_chunks_cover_surface(frames):
    poses, depths, rgbs = frames
    vol = TSDFVolume(CFG)
    slots = vol.discover_chunks(jnp.asarray(depths[0]), jnp.asarray(poses[0]))
    assert len(slots) > 10
    # surface points (backprojected depth) must all fall in allocated chunks
    pts = cam.backproject_depth_map(INTR, jnp.asarray(depths[0]))
    from texturefusion_tpu.core import se3
    pts_w = np.asarray(se3.transform_points(jnp.asarray(poses[0]), pts.reshape(-1, 3)))
    valid = depths[0].reshape(-1) > 0
    ids = np.unique(np.floor(pts_w[valid] / vol.extent).astype(np.int32), axis=0)
    missing = [tuple(c) for c in ids.tolist() if tuple(c) not in vol.slot_of]
    assert not missing, f"{len(missing)} surface chunks missed"


def test_integrate_sdf_matches_analytic(frames):
    poses, depths, rgbs = frames
    vol = TSDFVolume(CFG)
    for p, d, c in zip(poses, depths, rgbs):
        q = jnp.zeros_like(jnp.asarray(d))
        vol.integrate_frame(jnp.asarray(d), jnp.asarray(c), q, jnp.asarray(p),
                            keyframe_id=0)
    assert vol.n_active() > 10

    # sample points slightly inside the room near the +z wall: analytic
    # distance-to-surface should match the fused projective TSDF (roughly)
    rng = np.random.default_rng(0)
    pts = np.stack([
        rng.uniform(-0.5, 0.5, 200),
        rng.uniform(-0.4, 0.4, 200),
        rng.uniform(1.90, 1.98, 200),   # wall at z=2.0
    ], axis=-1).astype(np.float32)
    sdf, ok = vol.sdf_at(jnp.asarray(pts))
    sdf = np.asarray(sdf)
    ok = np.asarray(ok)
    assert ok.sum() > 50, f"only {ok.sum()} valid samples"
    analytic = 2.0 - pts[:, 2]
    err = np.abs(sdf[ok] - analytic[ok])
    # projective TSDF vs euclidean + voxel quantization: allow ~1 voxel
    assert np.median(err) < CFG.tsdf.voxel_resolution, np.median(err)


def test_deintegration_cancels(frames):
    poses, depths, rgbs = frames
    vol = TSDFVolume(CFG)
    d0 = jnp.asarray(depths[0])
    c0 = jnp.asarray(rgbs[0])
    q0 = jnp.zeros_like(d0)
    p0 = jnp.asarray(poses[0])
    slots = vol.integrate_frame(d0, c0, q0, p0, keyframe_id=0, sign=1.0)
    w_after = np.asarray(vol.batch.weight).copy()
    assert w_after.sum() > 0
    vol.integrate_frame(d0, c0, q0, p0, keyframe_id=0, sign=-1.0, slots=slots)
    w_final = np.asarray(vol.batch.weight)
    sdf_final = np.asarray(vol.batch.sdf)
    # every voxel weight returns to 0 and sdf resets
    assert np.abs(w_final[:-1]).max() == 0.0
    np.testing.assert_allclose(sdf_final[:-1], tsdf_ops.RESET_SDF)


def test_observation_quality_recorded(frames):
    poses, depths, rgbs = frames
    vol = TSDFVolume(CFG)
    d = jnp.asarray(depths[0])
    q = preprocess.observation_quality_map(
        jnp.asarray(rgbs[0]), d,
        preprocess.extract_normal_map(d, INTR), INTR)
    vol.integrate_frame(d, jnp.asarray(rgbs[0]), q, jnp.asarray(poses[0]),
                        keyframe_id=7)
    all_obs = [obs for obs in vol.observations.values() if 7 in obs]
    assert len(all_obs) > 5
    # fully-visible chunks should have positive quality; partially visible
    # ones are poisoned to -1e11
    qualities = np.asarray([obs[7] for obs in all_obs])
    assert (qualities > 0).sum() > 0
    assert ((qualities > 0) | (qualities < -1e10) | (qualities == 0)).all()


def test_release_and_gc(frames):
    poses, depths, rgbs = frames
    vol = TSDFVolume(CFG)
    d0 = jnp.asarray(depths[0])
    slots = vol.integrate_frame(d0, None, None, jnp.asarray(poses[0]))
    n0 = vol.n_active()
    # GC frees only never-observed chunks
    freed = vol.garbage_collect(slots)
    assert vol.n_active() == n0 - len(freed)
    for s in freed:
        assert not vol.used[s]
    # explicit release clears rows
    remaining = vol.active_slots()
    vol.release(remaining)
    assert vol.n_active() == 0
    assert len(vol.free) == CFG.tsdf.capacity


def test_batched_local_integration_matches_scan():
    """integrate_depths_batched (one pass over the chunk rows) must match
    the sequential per-frame scan — the running average commutes."""
    import jax
    from texturefusion_tpu.config import tiny_test_config
    from texturefusion_tpu.core import camera as cam
    from texturefusion_tpu.io import synthetic

    cfg = tiny_test_config()
    intr = cam.Intrinsics.from_config(cfg.camera)
    scene = synthetic.BoxRoomScene()
    poses = synthetic.orbit_trajectory(4)
    depths, _ = synthetic.render_sequence(scene, intr, poses)
    d = jnp.stack([jnp.asarray(x) for x in depths])
    p = jnp.asarray(np.stack(poses).astype(np.float32))

    n_vox = cfg.tsdf.chunk_size ** 3
    ext = cfg.tsdf.chunk_size * cfg.tsdf.voxel_resolution
    cap = 64
    origins = np.zeros((cap + 1, 3), np.float32)
    k = 0
    for x in range(-4, 4):
        for y in range(-2, 2):
            origins[k] = [x * ext, y * ext, 1.8]
            k += 1
    idx = jnp.asarray(np.arange(32, dtype=np.int64))
    active = jnp.asarray(np.ones(32, bool))
    orig_j = jnp.asarray(origins)

    a = tsdf_ops.integrate_depths_scan(
        tsdf_ops.make_empty_batch(cap + 1, n_vox), orig_j, idx, active, d, p,
        jnp.float32(1.0), intr, cfg.tsdf)
    b = tsdf_ops.integrate_depths_batched(
        tsdf_ops.make_empty_batch(cap + 1, n_vox), orig_j, idx, active, d, p,
        jnp.float32(1.0), intr, cfg.tsdf)
    assert float(jnp.sum(b.weight)) > 0
    np.testing.assert_allclose(np.asarray(b.weight), np.asarray(a.weight),
                               atol=1e-4)
    mask = np.asarray(a.weight) > 0
    np.testing.assert_allclose(np.asarray(b.sdf)[mask],
                               np.asarray(a.sdf)[mask], atol=1e-3)
