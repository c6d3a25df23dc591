"""TUM on-disk format round trip: write a tiny dataset, run the CLI path.

Covers the loader stack the TUM runbook (docs/TUM_RUNBOOK.md) relies on:
associate.txt / calib.txt (incl. distortion fields) / groundtruth.txt
parsing (ref: BasicAPI.cpp:1032-1134), PNG decode, InputMode-0 sensor,
and an end-to-end pipeline run over the loaded frames.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.io import synthetic, tum


def _write_dataset(root, n=6, distortion=False):
    cfg = tiny_test_config()
    camera = cfg.camera
    if distortion:
        import dataclasses
        camera = dataclasses.replace(camera, d0=-0.05, d1=0.01)
    intr = cam.Intrinsics.from_config(camera)
    scene = synthetic.BoxRoomScene()
    poses = synthetic.orbit_trajectory(n, radius=0.6)
    depths, rgbs = synthetic.render_sequence(scene, intr, poses)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    lines, gt_lines = [], []
    from texturefusion_tpu.core import se3
    for i, (d, c) in enumerate(zip(depths, rgbs)):
        ts = 1000.0 + 0.033 * i
        rp, dp = f"rgb/{i:06d}.png", f"depth/{i:06d}.png"
        cv2.imwrite(os.path.join(root, rp),
                    cv2.cvtColor((c * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(root, dp),
                    (d * camera.depth_scale).astype(np.uint16))
        lines.append(f"{ts:.6f} {rp} {ts:.6f} {dp}")
        q = np.asarray(se3.quaternion_from_matrix(
            jnp.asarray(poses[i][:3, :3])))
        t = poses[i][:3, 3]
        gt_lines.append(f"{ts:.6f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
    with open(os.path.join(root, "associate.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    calib = (f"{camera.fx} {camera.fy} {camera.cx} {camera.cy} "
             f"{camera.width} {camera.height} {camera.depth_scale}")
    if distortion:
        calib += f" {camera.d0} {camera.d1} {camera.d2} {camera.d3} {camera.d4}"
    with open(os.path.join(root, "calib.txt"), "w") as f:
        f.write(calib + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
    return camera, poses, depths


def test_loader_round_trip(tmp_path):
    root = str(tmp_path / "seq")
    camera, poses, depths = _write_dataset(root, n=3, distortion=True)
    seq = tum.load_tum_sequence(root)
    assert len(seq) == 3
    # calib round trip incl. the distortion tail
    assert seq.camera.fx == pytest.approx(camera.fx)
    assert seq.camera.d0 == pytest.approx(-0.05)
    assert seq.camera.depth_scale == pytest.approx(camera.depth_scale)
    d, rgb = seq.load_frame(0)
    valid = d > 0
    assert valid.mean() > 0.5
    np.testing.assert_allclose(d[valid], depths[0][valid], atol=2e-4)
    # groundtruth poses parsed back to the written ones
    assert seq.gt_poses is not None and len(seq.gt_poses) == 3
    np.testing.assert_allclose(seq.gt_poses[1], poses[1], atol=1e-5)


def test_dataset_sensor_drives_pipeline(tmp_path):
    root = str(tmp_path / "seq")
    _write_dataset(root, n=6)
    from texturefusion_tpu.fusion.pipeline import ReconstructionPipeline
    from texturefusion_tpu.io import sensors
    sensor = sensors.open_sensor(0, root, None)
    config = tiny_test_config().replace(camera=sensor.camera)
    pipe = ReconstructionPipeline(config)
    ts_all = []
    for ts, depth, rgb in sensor.frames():
        pipe.process_frame(jnp.asarray(depth), rgb, timestamp=ts)
        ts_all.append(ts)
    pipe.finish()
    assert pipe.stats["frames"] == 6
    assert pipe.volume.n_active() > 0
    # ATE vs the written groundtruth through the timestamp association
    pairs = tum.associate_timestamps(
        np.asarray(ts_all), sensor.seq.gt_timestamps, max_dt=0.01)
    assert len(pairs) == 6
    est = pipe.trajectory()[[i for i, _ in pairs]]
    gt = sensor.seq.gt_poses[[j for _, j in pairs]]
    assert tum.ate_rmse(est, gt) < 0.05
