"""CLI entry point.

Mirrors the reference binary's interface
(ref: README.md:102-131 `./FlashFusion $DataFolder $ParamsFile Resolution
InputMode`; arg parsing BasicAPI.cpp:1169-1205; final exports
main.cpp:213-317):

    python -m texturefusion_tpu DATA_FOLDER PARAMS_FILE RESOLUTION INPUT_MODE
           [--out OUT_DIR] [--max-frames N] [--no-texture]

Emits trajectory.txt (TUM format), fused PLY, textured OBJ/MTL/PNG and
stat timing report into OUT_DIR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def load_params_yaml(path: str) -> dict:
    """Parse the reference's OpenCV-YAML settings file
    (ref: BasicAPI.cpp:41-72 loadGlobalParameters; settings.yaml)."""
    out = {}
    if not path or not os.path.exists(path):
        return out
    for line in open(path):
        line = line.split("#")[0].strip()
        if ":" in line and not line.startswith("%"):
            k, _, v = line.partition(":")
            v = v.strip()
            if not v:
                continue
            try:
                out[k.strip()] = float(v) if "." in v or "e" in v else int(v)
            except ValueError:
                out[k.strip()] = v
    return out


def apply_params(config, params: dict):
    """Map GlobalParameters names onto the typed config."""
    t = config.tracking
    mapping = {
        "max_feature_num": "max_features",
        "ransac_maximum_iterations": "ransac_iterations",
        "maximum_keyframe_match_num": "max_candidates",
        "minimum_disparity": "minimum_disparity",
        "reprojection_error_3d_threshold": "reproj_3d_threshold",
        "reprojection_error_2d_threshold": "reproj_2d_threshold",
        "keyframe_minimum_distance": "keyframe_min_distance",
        "hamming_distance_threshold": "hamming_threshold",
        "salient_score_threshold": "salient_score_threshold",
        "use_fine_search": "use_fine_search",
    }
    kw = {}
    for src, dst in mapping.items():
        if src in params:
            val = params[src]
            cur = getattr(t, dst)
            kw[dst] = type(cur)(val)
    if kw:
        import dataclasses
        t = dataclasses.replace(t, **kw)
    far = params.get("far_plane_distance")
    camera = config.camera
    if far:
        import dataclasses
        camera = dataclasses.replace(camera, far_plane=float(far))
    return config.replace(tracking=t, camera=camera)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="texturefusion_tpu")
    ap.add_argument("data_folder")
    ap.add_argument("params_file")
    ap.add_argument("resolution", type=float,
                    help="voxel resolution in meters (0.005-0.04)")
    ap.add_argument("input_mode", type=int,
                    help="0 dataset, 1 OpenNI2, 2 RealSense, 4 synthetic")
    ap.add_argument("--out", default="./output")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-texture", action="store_true")
    args = ap.parse_args(argv)

    import dataclasses
    import numpy as np

    from texturefusion_tpu.config import PipelineConfig, TSDFConfig
    from texturefusion_tpu.fusion.pipeline import (ReconstructionPipeline,
                                                   TexturedPipeline)
    from texturefusion_tpu.io import sensors, tum
    from texturefusion_tpu.utils.stopwatch import STOPWATCH

    config = PipelineConfig(
        tsdf=TSDFConfig(voxel_resolution=args.resolution))
    params = load_params_yaml(args.params_file)
    config = apply_params(config, params)

    sensor = sensors.open_sensor(args.input_mode, args.data_folder,
                                 config.camera)
    config = config.replace(camera=sensor.camera)

    cls = ReconstructionPipeline if args.no_texture else TexturedPipeline
    pipe = cls(config)

    from texturefusion_tpu.io.prefetch import prefetch_frames

    t0 = time.time()
    n = 0
    for item in prefetch_frames(sensor.frames(), keep_host=True):
        ts, depth, rgb, host = item
        pipe.process_frame(depth, rgb, timestamp=ts,
                           host_packed=host[1] if hasattr(host[1], "shape")
                           else None)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    pipe.finish()
    dt = time.time() - t0
    print(f"processed {n} frames in {dt:.1f}s ({n / dt:.2f} fps), "
          f"stats={pipe.stats}")
    print(STOPWATCH.report())

    os.makedirs(args.out, exist_ok=True)
    pipe.save_trajectory(os.path.join(args.out, "trajectory.txt"))
    pipe.save_stats(args.out)
    pipe.save_keyframe_textures(os.path.join(args.out, "keyframes"))
    n_verts = pipe.export_mesh(os.path.join(args.out, "fused.ply"))
    print(f"fused.ply: {n_verts} vertices")
    if not args.no_texture:
        try:
            pipe._texture_cycle()
            obj = pipe.export_textured(args.out)
            print("textured model:", obj)
        except RuntimeError as e:
            print("texture export skipped:", e)

    # ATE if ground truth is available (dataset mode)
    if args.input_mode == 0:
        seq = sensor.seq
        if seq.gt_poses is not None and len(seq.gt_poses):
            pairs = tum.associate_timestamps(
                np.asarray([f.timestamp for f in pipe.slam.frames]),
                seq.gt_timestamps, max_dt=0.05)
            if len(pairs) > 2:
                est = pipe.trajectory()[[i for i, _ in pairs]]
                gt = seq.gt_poses[[j for _, j in pairs]]
                print(f"ATE RMSE: {tum.ate_rmse(est, gt) * 1000:.1f} mm "
                      f"({len(pairs)} poses)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
