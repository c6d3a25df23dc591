"""Multi-device scaling benchmark: sharded TSDF + distributed BA.

Reports frames/s for the chunk-sharded integration step and BA GN
iterations/s at 1 device vs all available devices, plus scaling
efficiency — the BASELINE.md reporting points. On a single-chip box this
measures 1-chip numbers and the virtual-device path only validates
correctness (CPU virtual devices do not give meaningful speedups).

Usage: python examples/bench_multichip.py [--devices N] [--cap 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bench_sharded_tsdf(n_devices, cap, n_iters=20):
    from texturefusion_tpu.config import CameraConfig, TSDFConfig
    from texturefusion_tpu.core import camera as cam
    from texturefusion_tpu.parallel import sharded_tsdf
    from texturefusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices)
    intr = cam.Intrinsics.from_config(CameraConfig(far_plane=6.0))
    cfg = TSDFConfig(voxel_resolution=0.02, capacity=cap)
    n_vox = cfg.chunk_size ** 3
    batch, origins = sharded_tsdf.make_sharded_batch(cap, n_vox, mesh)
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P("shard"))
    origins = jax.device_put(
        jnp.asarray((rng.integers(-10, 10, (cap, 3)) * 0.16).astype(np.float32)), sh)
    active = jax.device_put(jnp.ones(cap, bool), sh)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, (intr.height, intr.width)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (intr.height, intr.width, 3)).astype(np.float32))
    quality = jnp.zeros_like(depth)
    pose = jnp.eye(4)
    step = sharded_tsdf.sharded_integrate_step(mesh, intr, cfg)
    batch, _ = step(batch, origins, active, depth, rgb, quality, pose,
                    jnp.float32(1.0))
    jax.block_until_ready(batch.sdf)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        batch, _ = step(batch, origins, active, depth, rgb, quality, pose,
                        jnp.float32(1.0))
    jax.block_until_ready(batch.sdf)
    dt = time.perf_counter() - t0
    return n_iters / dt


def bench_distributed_ba(n_devices, n_kf=64, n_edges=512, n_iters=10):
    from texturefusion_tpu.config import BAConfig
    from texturefusion_tpu.parallel import ba as pba
    from texturefusion_tpu.parallel.mesh import make_mesh
    from texturefusion_tpu.slam import fastba

    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(1)
    edges = fastba.make_edges(n_edges)
    ki = rng.integers(0, n_kf - 1, n_edges)
    kj = ki + 1
    p = rng.uniform(-1, 1, (n_edges, 64, 3)).astype(np.float32)
    sums = [fastba.preintegrate_edge(jnp.asarray(p[e]), jnp.asarray(p[e]),
                                     jnp.ones(64)) for e in range(8)]
    edges = edges._replace(
        kf_i=jnp.asarray(ki, jnp.int32), kf_j=jnp.asarray(kj, jnp.int32),
        s_w=jnp.full(n_edges, 64.0),
        s_p=jnp.tile(sums[0][1], (n_edges, 1)),
        s_q=jnp.tile(sums[0][2], (n_edges, 1)),
        s_pp=jnp.tile(sums[0][3], (n_edges, 1, 1)),
        s_qq=jnp.tile(sums[0][4], (n_edges, 1, 1)),
        s_pq=jnp.tile(sums[0][5], (n_edges, 1, 1)),
        valid=jnp.ones(n_edges, bool))
    edges = pba.shard_edges(pba.pad_edges_for_mesh(edges, mesh.size), mesh)
    poses = jnp.tile(jnp.eye(4), (n_kf, 1, 1))
    active = jnp.ones(n_kf, bool)
    cfg = BAConfig(gn_iterations_per_round=4)
    out = pba.distributed_gn(poses, edges, n_kf, active, cfg, mesh)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pba.distributed_gn(poses, edges, n_kf, active, cfg, mesh)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    return n_iters * cfg.gn_iterations_per_round / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=4096)
    args = ap.parse_args()
    n_all = len(jax.devices())
    print(f"devices available: {n_all} ({jax.devices()[0].platform})")

    fps1 = bench_sharded_tsdf(1, args.cap)
    print(f"sharded TSDF integrate, 1 device: {fps1:.2f} steps/s "
          f"({args.cap} chunks resident)")
    ba1 = bench_distributed_ba(1)
    print(f"distributed BA, 1 device: {ba1:.1f} GN iters/s")
    if n_all > 1:
        fpsN = bench_sharded_tsdf(n_all, args.cap)
        baN = bench_distributed_ba(n_all)
        eff_tsdf = fpsN / (fps1 * n_all)
        eff_ba = baN / ba1
        print(f"sharded TSDF integrate, {n_all} devices: {fpsN:.2f} steps/s "
              f"(scaling efficiency {eff_tsdf:.0%})")
        print(f"distributed BA, {n_all} devices: {baN:.1f} GN iters/s "
              f"(vs 1-device {eff_ba:.0%})")
    else:
        print("single device only — multi-chip efficiency requires hardware")


if __name__ == "__main__":
    main()
