"""Per-stage timing of the fusion frame path on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(name, fn, n=5):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>32s}: {dt * 1000:8.1f} ms")
    return out


def main():
    from texturefusion_tpu.config import CameraConfig, PipelineConfig, TSDFConfig
    from texturefusion_tpu.core import camera as cam
    from texturefusion_tpu.fusion.chunkmap import TSDFVolume
    from texturefusion_tpu.io import synthetic
    from texturefusion_tpu.ops import preprocess, tsdf as T

    config = PipelineConfig(
        camera=CameraConfig(far_plane=6.0),
        tsdf=TSDFConfig(voxel_resolution=0.02, capacity=16384,
                        max_update_chunks=1024))
    intr = cam.Intrinsics.from_config(config.camera)
    scene = synthetic.BoxRoomScene()
    pose = jnp.asarray(synthetic.orbit_trajectory(1)[0])
    print("rendering...")
    depth_np, rgb_np = synthetic.render_sequence(scene, intr,
                                                 synthetic.orbit_trajectory(1))
    depth_np, rgb_np = depth_np[0], rgb_np[0]

    # dispatch latency + transfer bandwidth
    tiny = jnp.zeros(8)
    timeit("tiny op (dispatch latency)", lambda: tiny + 1.0)
    timeit("h2d depth 1.2MB", lambda: jnp.asarray(depth_np))
    timeit("h2d rgb 3.7MB", lambda: jnp.asarray(rgb_np))
    depth = jnp.asarray(depth_np)
    rgb = jnp.asarray(rgb_np)
    big = jnp.zeros((16385, 512))
    timeit("d2h 1024 floats", lambda: np.asarray(big[0, :512]))

    timeit("preprocess_bundle",
           lambda: preprocess.preprocess_bundle(depth, rgb, intr))
    dpre, normals, quality, gray, blur = preprocess.preprocess_bundle(depth, rgb, intr)

    timeit("candidate_chunks_unique",
           lambda: T.candidate_chunks_unique(depth, pose, intr, config.tsdf,
                                             max_out=4096))
    ids, n = T.candidate_chunks_unique(depth, pose, intr, config.tsdf,
                                       max_out=4096)
    print(f"{'n unique chunks':>32s}: {int(n)}")

    vol = TSDFVolume(config)
    ids_np = np.asarray(ids)[:int(n)]

    def touch():
        s, nn = vol.alloc.touch(ids_np)
        return s
    t0 = time.perf_counter()
    for _ in range(5):
        touch()
    print(f"{'native touch':>32s}: {(time.perf_counter() - t0) / 5 * 1000:8.1f} ms")

    slots = vol.discover_chunks(depth, pose)
    idx, active = vol._padded(slots)

    def fused():
        out, q, upd = T.integrate_frame_fused(
            vol.batch, vol.origins, idx, active, depth, rgb, quality, pose,
            jnp.float32(1.0), intr, config.tsdf)
        vol.batch = out
        return q
    timeit("integrate_frame_fused", fused)

    def full():
        vol2_slots = vol.discover_chunks(depth, pose)
        i2, a2 = vol._padded(vol2_slots)
        out, q, upd = T.integrate_frame_fused(
            vol.batch, vol.origins, i2, a2, depth, rgb, quality, pose,
            jnp.float32(1.0), intr, config.tsdf)
        vol.batch = out
        return np.asarray(q)
    timeit("discover+touch+integrate+sync", full)


if __name__ == "__main__":
    main()
