"""Hand-written Pallas TPU kernels for the hottest image stencils.

The XLA fallback implementations (ops/preprocess.py) express the 9×9
bilateral stencil as 81 padded-shift arrays — correct, but each shift
materializes an HBM-sized temporary. The Pallas version keeps the whole
depth image resident in VMEM (VGA f32 ≈ 1.2 MB ≪ 16 MB) and accumulates
all taps on the VPU per row-band: one HBM read + one write per pixel
(ref for the role: the reference's AVX2 framePreprocess /
cv::bilateralFilter path, BasicAPI.cpp:942-997).

Kernels fall back to `interpret=True` off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except (RuntimeError, IndexError):
        return False


def _bilateral_kernel(radius, sigma_space, sigma_range, tile_h, halo,
                      d_ref, out_ref):
    """Grid over row bands; d_ref is the full halo-padded image in VMEM,
    out_ref the band [tile_h, W] owned by this program. Column shifts use
    pltpu.roll + an edge mask (lane-aligned concatenates are not
    expressible in Mosaic's vector layout)."""
    i = pl.program_id(0)
    band = d_ref[pl.ds(i * tile_h, tile_h + 2 * halo), :]
    w_img = band.shape[1]
    inv_2sr = 1.0 / (2.0 * sigma_range * sigma_range)
    center = band[halo:halo + tile_h, :]
    valid = center > 0.0
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_img), 1)
    acc = jnp.zeros_like(center)
    wacc = jnp.zeros_like(center)
    for dy in range(-radius, radius + 1):
        row = band[halo + dy:halo + dy + tile_h, :]
        for dx in range(-radius, radius + 1):
            if dx == 0:
                nb = row
            else:
                # value at column c comes from source column c+dx
                # (roll shift must be non-negative: wrap by width)
                nb = pltpu.roll(row, (-dx) % w_img, 1)
                nb = jnp.where((col + dx >= 0) & (col + dx < w_img),
                               nb, 0.0)
            w_s = float(np.exp(-(dy * dy + dx * dx)
                               / (2.0 * sigma_space * sigma_space)))
            diff = nb - center
            wgt = jnp.where(nb > 0.0,
                            w_s * jnp.exp(-(diff * diff) * inv_2sr), 0.0)
            acc = acc + wgt * nb
            wacc = wacc + wgt
    out = acc / jnp.maximum(wacc, 1e-12)
    out_ref[...] = jnp.where(valid & (wacc > 1e-12), out, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("radius", "sigma_space", "sigma_range"))
def bilateral_filter_pallas(depth: jnp.ndarray, radius: int = 4,
                            sigma_space: float = 4.5,
                            sigma_range: float = 0.03) -> jnp.ndarray:
    """Edge-preserving depth smoothing; same semantics as
    preprocess.bilateral_filter (invalid-0 aware)."""
    h, w = depth.shape
    tile_h = next((t for t in (40, 30, 24, 20, 12, 8) if h % t == 0), h)
    halo = radius
    padded = jnp.pad(depth, ((halo, halo), (0, 0)))
    n_tiles = h // tile_h

    kernel = functools.partial(_bilateral_kernel, radius, sigma_space,
                               sigma_range, tile_h, halo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), depth.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  if not _on_tpu() else
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if not _on_tpu() else pltpu.VMEM),
        interpret=not _on_tpu(),
    )(padded)
