"""End-to-end demo: fuse a synthetic RGB-D sequence into a textured mesh.

Equivalent of running the reference binary on the bundled synthesis
sequence with ground-truth poses (ref: README.md:127-131, main.cpp loop)
— BASELINE.json config 1: tracking + TSDF fusion, ATE vs ground truth.

Usage:  python examples/demo_synthetic.py [--frames 8] [--size small|vga]
                                          [--out /tmp/demo]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from texturefusion_tpu.config import CameraConfig, PipelineConfig, TSDFConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.fusion.mesher import IncrementalMesher
from texturefusion_tpu.io import ply, synthetic
from texturefusion_tpu.ops import preprocess


def run_slam_pipeline(config, scene, poses, depths, rgbs, args):
    """Full pipeline: tracking + loop closure + BA + fusion + meshing."""
    from texturefusion_tpu.fusion.pipeline import (ReconstructionPipeline,
                                                   TexturedPipeline)
    from texturefusion_tpu.io import tum
    from texturefusion_tpu.utils.stopwatch import STOPWATCH

    pipe = (TexturedPipeline if args.texture else ReconstructionPipeline)(config)
    t0 = time.time()
    for i, (d, c) in enumerate(zip(depths, rgbs)):
        pipe.process_frame(jnp.asarray(d), jnp.asarray(c), timestamp=float(i))
    pipe.finish()
    dt = time.time() - t0
    print(f"pipeline: {len(depths)} frames in {dt:.1f}s "
          f"({len(depths) / dt:.2f} fps incl. compile), stats={pipe.stats}")
    print(STOPWATCH.report())

    est = pipe.trajectory()
    rmse = tum.ate_rmse(est, np.stack(poses))
    verts, faces, colors, normals = pipe.mesher.full_mesh()
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "slam_fused.ply")
    ply.save_ply(out_path, verts, faces, colors, normals)
    pipe.save_trajectory(os.path.join(args.out, "trajectory.txt"))
    if args.texture:
        pipe._texture_cycle()
        try:
            obj = pipe.export_textured(args.out)
            print("textured model:", obj)
        except RuntimeError as e:
            print("texture export skipped:", e)
    verts_w = verts @ poses[0][:3, :3].T + poses[0][:3, 3]
    sdf_err = np.abs(np.asarray(scene.sdf(jnp.asarray(verts_w))))
    print(f"ATE RMSE: {rmse * 1000:.1f}mm | mesh: {len(verts)} verts, "
          f"median surf err {np.median(sdf_err) * 1000:.1f}mm")
    ok = rmse < 0.02 and np.median(sdf_err) < config.tsdf.voxel_resolution
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="small", choices=["small", "vga"])
    ap.add_argument("--out", default="/tmp/demo")
    ap.add_argument("--voxel", type=float, default=0.03)
    ap.add_argument("--slam", action="store_true",
                    help="full pipeline with tracking instead of GT poses")
    ap.add_argument("--texture", action="store_true",
                    help="with --slam: online texturing + OBJ export")
    args = ap.parse_args()

    if args.size == "small":
        camera = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                              cx=159.5, cy=119.5, far_plane=6.0)
    else:
        camera = CameraConfig(far_plane=6.0)
    config = PipelineConfig(
        camera=camera,
        tsdf=TSDFConfig(voxel_resolution=args.voxel, capacity=8192,
                        max_update_chunks=1024),
    )
    intr = cam.Intrinsics.from_config(camera)
    print("devices:", jax.devices())

    scene = synthetic.BoxRoomScene()
    poses = synthetic.orbit_trajectory(args.frames)
    t0 = time.time()
    depths, rgbs = synthetic.render_sequence(scene, intr, poses)
    print(f"rendered {args.frames} frames in {time.time() - t0:.1f}s")

    if args.slam:
        return run_slam_pipeline(config, scene, poses, depths, rgbs, args)

    vol = TSDFVolume(config)
    mesher = IncrementalMesher(vol)
    t0 = time.time()
    for i, (p, d, c) in enumerate(zip(poses, depths, rgbs)):
        d = jnp.asarray(d)
        c = jnp.asarray(c)
        dpre = preprocess.frame_preprocess(d, intr)
        normals = preprocess.extract_normal_map(dpre, intr)
        quality = preprocess.observation_quality_map(c, dpre, normals, intr)
        vol.integrate_frame(dpre, c, quality, jnp.asarray(p), keyframe_id=i)
    jax.block_until_ready(vol.batch.sdf)
    dt = time.time() - t0
    print(f"fused {args.frames} frames in {dt:.1f}s "
          f"({args.frames / dt:.1f} fps), {vol.n_active()} chunks")

    t0 = time.time()
    n = mesher.update_meshes()
    verts, faces, colors, normals = mesher.full_mesh()
    print(f"meshed {n} chunks in {time.time() - t0:.1f}s: "
          f"{len(verts)} verts, {len(faces)} faces")

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "fused.ply")
    ply.save_ply(out_path, verts, faces, colors, normals)
    print("wrote", out_path)

    # geometric sanity: mesh vertices near the analytic surface
    sdf_err = np.abs(np.asarray(scene.sdf(jnp.asarray(verts))))
    print(f"mesh-to-surface error: median {np.median(sdf_err) * 1000:.1f}mm, "
          f"mean {sdf_err.mean() * 1000:.1f}mm "
          f"(voxel {config.tsdf.voxel_resolution * 1000:.0f}mm)")
    ok = np.median(sdf_err) < config.tsdf.voxel_resolution
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
