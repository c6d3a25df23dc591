"""Geometry helpers: chunk-grid indexing, AABBs, trilinear interpolation.

Replaces open_chisel/geometry/{AABB,Interpolate,Geometry} (ref:
open_chisel/geometry/*) and the ChunkID hashing scheme
(ref: Structure/ChunkManager.h:44-53).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Spatial hash mixing primes (same role as ChunkHasher, ref: ChunkManager.h:44-53).
_HASH_P1 = np.int64(73856093)
_HASH_P2 = np.int64(19349663)
_HASH_P3 = np.int64(83492791)


def chunk_id_hash(ids: np.ndarray, table_size: int) -> np.ndarray:
    """Host-side spatial hash of integer chunk IDs (N, 3) -> (N,)."""
    ids = ids.astype(np.int64)
    h = (ids[..., 0] * _HASH_P1) ^ (ids[..., 1] * _HASH_P2) ^ (ids[..., 2] * _HASH_P3)
    return (h % table_size + table_size) % table_size


def world_to_chunk(points: jnp.ndarray, chunk_extent: float) -> jnp.ndarray:
    """World points (..., 3) -> integer chunk IDs (..., 3)."""
    return jnp.floor(points / chunk_extent).astype(jnp.int32)


def chunk_origin(chunk_ids: jnp.ndarray, chunk_extent: float) -> jnp.ndarray:
    """Integer chunk IDs (..., 3) -> world origin of the chunk (min corner)."""
    return chunk_ids.astype(jnp.float32) * chunk_extent


def voxel_centroids(chunk_size: int, resolution: float) -> np.ndarray:
    """(chunk_size³, 3) voxel-center offsets from chunk origin, x-fastest.

    Matches open_chisel centroid caching (ref: ChunkManager.cpp:49-159
    CacheCentroids) with linear index i = x + y·S + z·S².
    """
    s = chunk_size
    idx = np.arange(s * s * s)
    x = idx % s
    y = (idx // s) % s
    z = idx // (s * s)
    return ((np.stack([x, y, z], axis=-1) + 0.5) * resolution).astype(np.float32)


def voxel_coords_in_chunk(chunk_size: int) -> np.ndarray:
    """(chunk_size³, 3) integer voxel coords, x-fastest linear order."""
    s = chunk_size
    idx = np.arange(s * s * s)
    return np.stack([idx % s, (idx // s) % s, idx // (s * s)], axis=-1).astype(np.int32)


def aabb_corners(min_c: jnp.ndarray, max_c: jnp.ndarray) -> jnp.ndarray:
    """AABB (..., 3) min/max -> (..., 8, 3) corners."""
    signs = jnp.array(
        [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)],
        dtype=min_c.dtype,
    )
    return min_c[..., None, :] + signs * (max_c - min_c)[..., None, :]


def trilinear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Fractional coords (..., 3) -> (..., 8) trilinear corner weights.

    Corner order matches aabb_corners (x-fastest)."""
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1 - fx, fx], axis=-1)  # (..., 2)
    wy = jnp.stack([1 - fy, fy], axis=-1)
    wz = jnp.stack([1 - fz, fz], axis=-1)
    w = (wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :])
    return w.reshape(frac.shape[:-1] + (8,))


def neighbor_offsets_6() -> np.ndarray:
    """The 6 axis-aligned neighbor offsets (ref: ChunkManager.h:55-57)."""
    return np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.int32,
    )


def neighbor_offsets_corner7() -> np.ndarray:
    """The 7 positive-corner neighbors used by cross-chunk marching cubes
    (+x, +y, +z, +xy, +xz, +yz, +xyz) — the chunks a 9³ SDF block spans
    (ref: ChunkManager.cpp:608-633 neighbor chunk pointer table)."""
    return np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
        dtype=np.int32,
    )
