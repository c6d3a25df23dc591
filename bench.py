"""Benchmark: end-to-end pipeline throughput per chip on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: ≥30 fps fusion+texture per chip (BASELINE.md — the
reference's real-time operating point on CPU).

Measures steady-state frames/s of the full reconstruction pipeline
(preprocessing → tracking → keyframe promotion → TSDF fusion with local
frames → incremental meshing) on VGA synthetic RGB-D frames fed in
compact sensor formats (uint16 depth / uint8 rgb), compile excluded via
warmup frames.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from texturefusion_tpu.config import (CameraConfig, ParallelConfig,
                                          PipelineConfig, TrackingConfig,
                                          TSDFConfig)
    from texturefusion_tpu.core import camera as cam
    from texturefusion_tpu.fusion.pipeline import ReconstructionPipeline
    from texturefusion_tpu.io import synthetic

    config = PipelineConfig(
        camera=CameraConfig(far_plane=6.0),
        tracking=TrackingConfig(blur_threshold=0.0),
        tsdf=TSDFConfig(voxel_resolution=0.02, capacity=16384,
                        max_update_chunks=1024),
        parallel=ParallelConfig(async_fusion=True),
    )
    intr = cam.Intrinsics.from_config(config.camera)
    scene = synthetic.BoxRoomScene()
    n_frames = 40
    n_warm = 12
    poses = synthetic.orbit_trajectory(n_frames)
    from texturefusion_tpu.ops.preprocess import pack_frame
    cache = f"/tmp/tf_bench_frames_{intr.width}x{intr.height}_{n_frames}.npz"
    if os.path.exists(cache):
        data = np.load(cache)
        packed = [data[f"f{i}"] for i in range(n_frames)]
    else:
        depths, rgbs = synthetic.render_sequence(scene, intr, poses)
        packed = [pack_frame((d * config.camera.depth_scale).astype(np.uint16),
                             (c * 255).astype(np.uint8))
                  for d, c in zip(depths, rgbs)]
        np.savez_compressed(cache, **{f"f{i}": p for i, p in enumerate(packed)})

    from texturefusion_tpu.io.prefetch import prefetch_frames

    # warmup pass: play the WHOLE sequence once through a throwaway
    # pipeline — this compiles every jit variant the timed pass will hit
    # (including late-appearing bucket sizes: BA keyframe/edge buckets,
    # mesher batch buckets) and warms every device→host fetch shape
    warm = ReconstructionPipeline(config)
    for i in range(n_frames):
        warm.process_frame(jnp.asarray(packed[i]), timestamp=float(i))
    warm._drain_fusion()
    jax.block_until_ready(warm.volume.batch.sdf)
    del warm

    pipe = ReconstructionPipeline(config)
    for i in range(n_warm):
        pipe.process_frame(jnp.asarray(packed[i]), timestamp=float(i))
    jax.block_until_ready(pipe.volume.batch.sdf)

    from texturefusion_tpu.utils.stopwatch import STOPWATCH
    STOPWATCH.reset()   # drop warmup/compile time from per-stage averages

    stream = prefetch_frames((float(i), packed[i])
                             for i in range(n_warm, n_frames))
    t0 = time.perf_counter()
    for ts, frame in stream:
        pipe.process_frame(frame, timestamp=ts)
    pipe._drain_fusion()
    jax.block_until_ready(pipe.volume.batch.sdf)
    dt = time.perf_counter() - t0
    fps = (n_frames - n_warm) / dt

    print("stats:", pipe.stats, file=sys.stderr)
    print(STOPWATCH.report(), file=sys.stderr)

    print(json.dumps({
        "metric": "pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (VGA, full SLAM+fusion, 2cm voxels)",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
