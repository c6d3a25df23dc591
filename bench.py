"""Benchmark: per-chip fusion throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: ≥30 fps fusion+texture per chip (BASELINE.md).

Measures the steady-state per-frame fusion path on VGA RGB-D frames:
chunk discovery → host allocator → gather → voxel integrate (color +
quality + observation recording) → scatter, exactly the per-frame device
work of the pipeline (tracking and meshing run at keyframe rate in the
reference's model and are benchmarked separately in examples/).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from texturefusion_tpu.config import CameraConfig, PipelineConfig, TSDFConfig
    from texturefusion_tpu.core import camera as cam
    from texturefusion_tpu.fusion.chunkmap import TSDFVolume
    from texturefusion_tpu.io import synthetic
    from texturefusion_tpu.ops import preprocess

    config = PipelineConfig(
        camera=CameraConfig(far_plane=6.0),
        tsdf=TSDFConfig(voxel_resolution=0.02, capacity=16384,
                        max_update_chunks=1024),
    )
    intr = cam.Intrinsics.from_config(config.camera)
    scene = synthetic.BoxRoomScene()
    n_frames = 24
    poses = synthetic.orbit_trajectory(n_frames)
    depths, rgbs = synthetic.render_sequence(scene, intr, poses[:4])
    # reuse 4 rendered frames cyclically (rendering isn't part of the bench)
    vol = TSDFVolume(config)

    def fuse(i, pose):
        d = jnp.asarray(depths[i % 4])
        c = jnp.asarray(rgbs[i % 4])
        dpre = preprocess.frame_preprocess(d, intr)
        normals = preprocess.extract_normal_map(dpre, intr)
        q = preprocess.observation_quality_map(c, dpre, normals, intr)
        vol.integrate_frame(dpre, c, q, jnp.asarray(pose), keyframe_id=i)

    # warmup / compile
    for i in range(3):
        fuse(i, poses[i])
    jax.block_until_ready(vol.batch.sdf)

    t0 = time.perf_counter()
    for i in range(3, n_frames):
        fuse(i, poses[i])
    jax.block_until_ready(vol.batch.sdf)
    dt = time.perf_counter() - t0
    fps = (n_frames - 3) / dt

    print(json.dumps({
        "metric": "fusion_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (VGA, 2cm voxels)",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
