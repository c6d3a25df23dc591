"""Chunk-sharded TSDF integration over a device mesh.

BASELINE.json configs 4-5: TSDF chunk slots are partitioned across
devices (the natural shard axis — integration, meshing and texture work
are chunk-local, SURVEY.md §2.3). The depth/color images are replicated
(small); each device updates only its resident chunk rows. The host
allocator assigns chunk slots round-robin so new surface spreads evenly.

This module provides the sharded update step used by dryrun_multichip and
the multi-chip benchmark path; the single-chip pipeline uses
fusion/chunkmap.py directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from texturefusion_tpu.config import TSDFConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.ops import tsdf as tsdf_ops


def make_sharded_batch(capacity: int, n_voxels: int, mesh: Mesh,
                       axis: str = "shard") -> Tuple[tsdf_ops.ChunkBatch, jnp.ndarray]:
    """Slot arrays sharded on the chunk axis. capacity must divide the
    mesh size. Returns (batch, origins)."""
    assert capacity % mesh.shape[axis] == 0
    sh = NamedSharding(mesh, P(axis))
    batch = tsdf_ops.ChunkBatch(
        sdf=jax.device_put(jnp.full((capacity, n_voxels), tsdf_ops.RESET_SDF), sh),
        weight=jax.device_put(jnp.zeros((capacity, n_voxels)), sh),
        color=jax.device_put(jnp.zeros((capacity, n_voxels, 3)), sh),
        color_count=jax.device_put(jnp.zeros((capacity, n_voxels)), sh),
    )
    origins = jax.device_put(jnp.zeros((capacity, 3)), sh)
    return batch, origins


def sharded_integrate_step(mesh: Mesh, intr: cam.Intrinsics, cfg: TSDFConfig,
                           axis: str = "shard"):
    """Build a jitted all-slots integration step with chunk rows sharded.

    Unlike the gather/scatter path (fusion/chunkmap.py), the sharded step
    updates EVERY resident slot against the (replicated) frame — each
    device touches only its rows; no cross-device traffic except the
    image broadcast. `active` masks allocated slots.
    """
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    batch_sh = tsdf_ops.ChunkBatch(sdf=sh, weight=sh, color=sh, color_count=sh)

    @functools.partial(
        jax.jit,
        in_shardings=(batch_sh, sh, sh, rep, rep, rep, rep, rep),
        out_shardings=(batch_sh, sh),
        donate_argnums=(0,),
    )
    def step(batch, origins, active, depth, rgb, quality, cam_to_world, sign):
        new_batch, chunk_quality, _ = tsdf_ops.integrate_chunks(
            batch, origins, active, depth, rgb, quality, cam_to_world,
            sign, intr, cfg, with_color=True)
        return new_batch, chunk_quality

    return step
