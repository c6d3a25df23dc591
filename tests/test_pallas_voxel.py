"""Bit-parity of the Pallas voxel-update kernel vs the XLA oracle.

The Pallas kernel (examples/pallas_voxel_kernel.py — demoted from the
production path, see its docstring + SOL_REPORT.json) must reproduce
ops.tsdf.integrate_chunks exactly — same SDF/weight/color/quality
semantics as the reference's AVX2 voxelUpdateSIMD
(ref: ProjectionIntegrator.cpp:67-426). Runs in interpret mode on CPU;
the same code path compiles via Mosaic on TPU.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import CameraConfig, PipelineConfig, TSDFConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.ops import tsdf as tsdf_ops

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from pallas_voxel_kernel import integrate_rows_pallas  # noqa: E402


def _setup(with_color=True, sign=1.0, seed=0, pre_integrated=False):
    config = PipelineConfig(
        camera=CameraConfig(width=128, height=96, fx=100.0, fy=100.0,
                            cx=63.5, cy=47.5, far_plane=6.0),
        tsdf=TSDFConfig(voxel_resolution=0.05, capacity=64,
                        max_update_chunks=16),
    )
    intr = cam.Intrinsics.from_config(config.camera)
    cfg = config.tsdf
    v = cfg.chunk_size ** 3
    rng = np.random.default_rng(seed)

    # a flat wall at z=2 plus noise; some pixels invalid
    d = np.full((intr.height, intr.width), 2.0, np.float32)
    d += rng.normal(0, 0.02, d.shape).astype(np.float32)
    d[rng.random(d.shape) < 0.05] = 0.0
    rgb = rng.random((intr.height, intr.width, 3)).astype(np.float32)
    quality = rng.random((intr.height, intr.width)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)

    batch = tsdf_ops.make_empty_batch(cfg.capacity + 1, v)
    if pre_integrated:
        sdfs = rng.normal(0, 0.05, (cfg.capacity + 1, v)).astype(np.float32)
        ws = rng.integers(0, 4, (cfg.capacity + 1, v)).astype(np.float32)
        cols = rng.random((cfg.capacity + 1, v, 3)).astype(np.float32) * 90
        ccs = ws.copy()
        batch = tsdf_ops.ChunkBatch(jnp.asarray(sdfs), jnp.asarray(ws),
                                    jnp.asarray(cols), jnp.asarray(ccs))
    # chunks straddling the wall in front of the camera (z ≈ 2 m — the
    # kernel's 32-row test window covers extent·fy/z = 20 px there)
    ids = []
    for x in range(-2, 2):
        for y in range(-1, 2):
            ids.append((x, y, 4))     # z chunk 4..5 → 1.6-2.4 m at 0.4 ext
    ids = np.asarray(ids, np.int32)
    extent = cfg.chunk_size * cfg.voxel_resolution
    n = len(ids)
    u = 16
    idx = np.concatenate([np.arange(n), np.full(u - n, cfg.capacity)])
    origins_full = np.zeros((cfg.capacity + 1, 3), np.float32)
    origins_full[:n] = ids * extent
    active = np.arange(u) < n
    return (config, intr, cfg, batch, jnp.asarray(origins_full),
            jnp.asarray(idx), jnp.asarray(active), jnp.asarray(d),
            jnp.asarray(rgb), jnp.asarray(quality), jnp.asarray(pose),
            sign)


@pytest.mark.parametrize("sign,pre", [(1.0, False), (1.0, True),
                                      (-1.0, True)])
def test_pallas_matches_xla_oracle(sign, pre):
    (config, intr, cfg, batch, origins_full, idx, active, d, rgb,
     quality, pose, sign) = _setup(sign=sign, pre_integrated=pre)

    ref_batch, ref_q, ref_upd = tsdf_ops.integrate_frame_fused(
        jax.tree.map(jnp.copy, batch), origins_full, idx, active,
        d, rgb, quality, pose, jnp.float32(sign), intr, cfg,
        with_color=True)

    img = jnp.stack([d, rgb[..., 0] * 255.0, rgb[..., 1] * 255.0,
                     rgb[..., 2] * 255.0, quality])
    from texturefusion_tpu.core import se3
    w2c = se3.inverse(pose).reshape(-1)
    sdf, w, col, cc, q, upd = integrate_rows_pallas(
        batch.sdf, batch.weight, batch.color, batch.color_count,
        origins_full[idx], idx, active.astype(jnp.int32), img,
        w2c, jnp.asarray([sign], jnp.float32), intr, cfg,
        with_color=True, win=32, interpret=True)

    np.testing.assert_allclose(np.asarray(sdf), np.asarray(ref_batch.sdf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_batch.weight),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), np.asarray(ref_batch.color),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cc),
                               np.asarray(ref_batch.color_count),
                               rtol=1e-6, atol=1e-6)
    n_real = int(np.asarray(active).sum())
    np.testing.assert_allclose(np.asarray(q)[:n_real],
                               np.asarray(ref_q)[:n_real],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(upd)[:n_real],
                                  np.asarray(ref_upd)[:n_real])


def test_pallas_depth_only():
    (config, intr, cfg, batch, origins_full, idx, active, d, rgb,
     quality, pose, sign) = _setup(pre_integrated=True)
    ref_batch, _, _ = tsdf_ops.integrate_frame_fused(
        jax.tree.map(jnp.copy, batch), origins_full, idx, active,
        d, rgb, quality, pose, jnp.float32(1.0), intr, cfg,
        with_color=False)
    img = jnp.stack([d, rgb[..., 0], rgb[..., 1], rgb[..., 2], quality])
    from texturefusion_tpu.core import se3
    w2c = se3.inverse(pose).reshape(-1)
    sdf, w, col, cc, _, _ = integrate_rows_pallas(
        batch.sdf, batch.weight, batch.color, batch.color_count,
        origins_full[idx], idx, active.astype(jnp.int32), img,
        w2c, jnp.asarray([1.0], jnp.float32), intr, cfg,
        with_color=False, win=32, interpret=True)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(ref_batch.sdf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(col), np.asarray(ref_batch.color),
                               rtol=1e-6, atol=1e-6)
