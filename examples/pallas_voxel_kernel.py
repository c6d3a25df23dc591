"""Pallas TSDF voxel-update kernel — DEMOTED case study, not a
production path (VERDICT r4 #6).

Hand-written TPU kernel with the same semantics as the XLA formulation in
ops/tsdf.py:integrate_chunks (the production kernel and the bit-parity
test oracle) — both re-designs of open_chisel's AVX2 kernel
(ref: 3rd_party/open_chisel/utils/ProjectionIntegrator.cpp:67-426
voxelUpdateSIMD; signed-weight de-integration :94-99; color saturation
:201-305; partial-observation quality veto :212-238).

WHY DEMOTED (SOL_REPORT.json): the voxel update's hot operation is an
arbitrary 2D image gather per voxel. Mosaic's `dynamic_gather` is
vreg-local (≤8×128 source), so this kernel samples via one-hot MXU
products — ~160× the useful FLOPs — and measures 1.332 ms/integrate vs
the XLA path's 0.383 ms (both far from the 0.025 ms HBM roofline, which
neither formulation can reach while the sample pattern is
data-dependent). XLA's native gather fusion simply wins on TPU for this
access pattern. The kernel stays here, bit-parity-tested
(tests/test_pallas_voxel.py), as the documented negative result and as
scaffolding if Mosaic ever grows a wide dynamic gather.

Kernel design (VMEM-resident, one HBM row read+write per touched chunk):
  * grid = one step per chunk slot; the slot list arrives as a
    scalar-prefetch operand and drives the BlockSpec index_map, so each
    step's TSDF rows are DMA'd straight from their HBM slot row and
    written back in place (input_output_aliases) — no gathered sub-batch
    copies, no scatter pass.
  * the packed [5, H, W] image (depth | rgb×255 | quality) lives whole
    in VMEM (~6 MB at VGA f32).
  * the per-voxel image sample — an arbitrary 2D gather — runs as
    ONE-HOT MATMULS on the MXU: Mosaic's `dynamic_gather` is vreg-local
    (≤ 8×128 source), so instead each chunk selects its voxels' columns
    with a [win, W] × [W, V] one-hot product over a WIN-row window and
    reduces rows with a one-hot mask. The window covers the chunk's
    projected v-extent; chunks closer than ~extent·fy/WIN (≈0.33 m at
    VGA/256 — under any depth camera's min range) clamp it and mask the
    clipped voxels.
  * the [V, 3]-interleaved color row is channel-split by static slices
    of a (1, V, 3) block + transposes — no lane shuffles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texturefusion_tpu.config import TSDFConfig
from texturefusion_tpu.core import camera as cam

RESET_SDF = 999.0
_PREC = jax.lax.Precision.HIGHEST


def _voxel_lane_coords(chunk: int, v_pad: int):
    """Per-lane voxel (x, y, z) integer coords, [1, v_pad] (x fastest)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, v_pad), 1)
    vx = lane % chunk
    vy = (lane // chunk) % chunk
    vz = lane // (chunk * chunk)
    return lane, vx, vy, vz


def _sample_planes(img_ref, channels, v0, dv, du, win: int, w_img: int):
    """Sample image planes at per-voxel integer pixel coords without any
    gather: columns via a one-hot MXU product, rows via a one-hot masked
    reduction, over a [win, W] row window starting at v0 (8-aligned).

    img_ref: [5, H, W] VMEM ref; channels: tuple of plane indices.
    dv/du: [1, V] int32 pre-clamped. Returns (list of [1, V] samples,
    in-window mask [1, V])."""
    v_pad = du.shape[1]
    # one-hot per-voxel column selector [W, V]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (w_img, v_pad), 0)
    oc = (col_iota == du).astype(jnp.float32)             # du bcast [1,V]
    dvr = dv - v0
    inwin = (dvr >= 0) & (dvr < win)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (win, v_pad), 0)
    orow = (row_iota == jnp.clip(dvr, 0, win - 1)).astype(jnp.float32)
    outs = []
    for c in channels:
        winv = img_ref[c, pl.ds(v0, win), :]              # [win, W]
        m1 = jnp.dot(winv, oc, preferred_element_type=jnp.float32,
                     precision=_PREC)                      # [win, V]
        outs.append(jnp.sum(m1 * orow, axis=0, keepdims=True))
    return outs, inwin


def _voxel_kernel(idx_ref, active_ref, origin_ref, pose_ref, sign_ref,
                  img_ref, sdf_ref, w_ref, cr_ref, cg_ref, cb_ref, cc_ref,
                  sdf_out, w_out, cr_out, cg_out, cb_out, cc_out, q_out,
                  *, intr: cam.Intrinsics, cfg: TSDFConfig, win: int,
                  v_pad: int, with_color: bool):
    i = pl.program_id(0)
    active = active_ref[i] > 0
    chunk = cfg.chunk_size
    v_real = chunk ** 3
    res = cfg.voxel_resolution
    res_diag = float(np.sqrt(3.0)) * res
    h_img, w_img = intr.height, intr.width

    lane, vx, vy, vz = _voxel_lane_coords(chunk, v_pad)
    lane_ok = lane < v_real

    # world position of each voxel centroid
    ox = origin_ref[i, 0]
    oy = origin_ref[i, 1]
    oz = origin_ref[i, 2]
    wx = ox + (vx.astype(jnp.float32) + 0.5) * res
    wy = oy + (vy.astype(jnp.float32) + 0.5) * res
    wz = oz + (vz.astype(jnp.float32) + 0.5) * res

    # world→camera (row-major 4×4 in SMEM)
    def tc(px, py, pz, r):
        return (pose_ref[r * 4 + 0] * px + pose_ref[r * 4 + 1] * py
                + pose_ref[r * 4 + 2] * pz + pose_ref[r * 4 + 3])

    cx_ = tc(wx, wy, wz, 0)
    cy_ = tc(wx, wy, wz, 1)
    cz_ = tc(wx, wy, wz, 2)

    # pinhole projection (ref: PinholeCamera project)
    zsafe = jnp.where(cz_ > 1e-6, cz_, 1.0)
    uf = intr.fx * cx_ / zsafe + intr.cx
    vf = intr.fy * cy_ / zsafe + intr.cy
    ui = jnp.round(uf).astype(jnp.int32)
    vi = jnp.round(vf).astype(jnp.int32)
    in_img = ((ui > 0) & (ui < w_img - 1) & (vi > 0) & (vi < h_img - 1)
              & (cz_ > 0))
    du = jnp.clip(ui, 0, w_img - 1)
    dv = jnp.clip(vi, 0, h_img - 1)

    # window start: min over in-image voxels, aligned DOWN to the 8-row
    # sublane tile (Mosaic requires provably aligned dynamic row slices)
    dv_for_min = jnp.where(in_img & lane_ok, dv, h_img - 1)
    v0 = jnp.clip(jnp.min(dv_for_min), 0, max(h_img - win, 0))
    v0 = pl.multiple_of((v0 // 8) * 8, 8)

    channels = (0, 1, 2, 3, 4) if with_color else (0,)
    samples, inwin = _sample_planes(img_ref, channels, v0, dv, du, win,
                                    w_img)
    in_img = in_img & inwin
    d = jnp.where(in_img, samples[0], 0.0)
    surface_dist = d - cz_

    # truncation once per chunk at the chunk origin's camera depth
    oz_cam = (pose_ref[8] * ox + pose_ref[9] * oy + pose_ref[10] * oz
              + pose_ref[11])
    trunc = jnp.abs(cfg.truncation_quad * oz_cam * oz_cam
                    + cfg.truncation_linear * oz_cam
                    + cfg.truncation_const) * cfg.truncation_scale

    depth_ok = (d > intr.near) & (d < intr.far)
    band = (surface_dist > -0.03) & (surface_dist < trunc + res_diag)
    sign = sign_ref[0]
    upd = in_img & depth_ok & band & active & lane_ok

    sdf = sdf_ref[0]                # block (1, 1, V) → [1, V]
    wgt = w_ref[0]
    w_in = jnp.where(upd, cfg.integration_weight * sign, 0.0)
    new_w = wgt + w_in
    new_sdf = (sdf * wgt + surface_dist * w_in) / (new_w + 1e-4)
    new_sdf = jnp.where(upd, new_sdf, sdf)
    new_w = jnp.where(upd, new_w, wgt)
    dead = upd & (new_w <= cfg.min_weight)
    new_sdf = jnp.where(dead, RESET_SDF, new_sdf)
    new_w = jnp.where(dead, 0.0, new_w)
    sdf_out[0] = new_sdf
    w_out[0] = new_w

    if with_color:
        color_band = jnp.abs(surface_dist) < (res_diag * 0.5
                                              + cfg.color_band_pad)
        cupd = in_img & depth_ok & color_band & active & lane_ok
        r_s, g_s, b_s, q_s = samples[1], samples[2], samples[3], samples[4]

        cr = cr_ref[0]
        cg = cg_ref[0]
        cb = cb_ref[0]
        cc = cc_ref[0]

        csign = jnp.where(cupd, sign, 0.0)
        nr = cr + jnp.where(cupd, r_s, 0.0) * sign
        ng = cg + jnp.where(cupd, g_s, 0.0) * sign
        nb = cb + jnp.where(cupd, b_s, 0.0) * sign
        ncc = cc + csign
        mx = jnp.maximum(nr, jnp.maximum(ng, nb))
        sat = (mx > cfg.color_saturation) & (sign > 0) & cupd
        nr = jnp.where(sat, nr * 0.25, nr)
        ng = jnp.where(sat, ng * 0.25, ng)
        nb = jnp.where(sat, nb * 0.25, nb)
        ncc = jnp.where(sat, ncc * 0.25, ncc)
        nr = jnp.where(cupd, nr, cr)
        ng = jnp.where(cupd, ng, cg)
        nb = jnp.where(cupd, nb, cb)
        ncc = jnp.where(cupd, ncc, cc)
        cr_out[0] = nr
        cg_out[0] = ng
        cb_out[0] = nb
        cc_out[0] = ncc

        # per-chunk observation quality + partial-view poison
        qv = jnp.where(cupd, q_s, 0.0)
        quality = jnp.sum(qv)
        partial = jnp.any((~in_img) & active & (cz_ > 0) & lane_ok)
        behind = jnp.any((cz_ <= 0) & lane_ok) & active
        quality = jnp.where(partial | behind, -1e11, quality)
    else:
        cr_out[0] = cr_ref[0]
        cg_out[0] = cg_ref[0]
        cb_out[0] = cb_ref[0]
        cc_out[0] = cc_ref[0]
        quality = jnp.float32(0.0)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    updated = jnp.where(jnp.any(upd), 1.0, 0.0)
    q_out[0] = jnp.where(lane128 == 0, quality,
                         jnp.where(lane128 == 1, updated, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("intr", "cfg", "with_color", "win", "interpret"),
    donate_argnames=("sdf", "weight", "color", "ccnt"))
def integrate_rows_pallas(
    sdf: jnp.ndarray,            # [S+1, V] FULL slot array (donated)
    weight: jnp.ndarray,         # [S+1, V]
    color: jnp.ndarray,          # [S+1, V, 3]
    ccnt: jnp.ndarray,           # [S+1, V]
    origins_sel: jnp.ndarray,    # [U, 3] f32 — origins of the idx rows
    idx: jnp.ndarray,            # [U] int32 slot indices (trash-padded)
    active: jnp.ndarray,         # [U] int32 (1 = live row)
    img_packed: jnp.ndarray,     # [5, H, W] f32: depth | rgb×255 | quality
    world_to_cam: jnp.ndarray,   # [16] f32 row-major
    sign: jnp.ndarray,           # [1] f32
    intr: cam.Intrinsics,
    cfg: TSDFConfig,
    with_color: bool = True,
    win: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Run the Pallas voxel kernel over the idx rows IN PLACE.

    Returns (sdf, weight, color, ccnt, quality[U], updated[U]).
    Semantics == ops.tsdf.integrate_chunks for chunks whose projected
    v-extent fits the WIN-row window (chunks nearer than ~extent·fy/WIN
    clamp; keep the near plane above that or use the XLA path)."""
    s1, v = sdf.shape
    u = idx.shape[0]
    win = min(win, (intr.height // 8) * 8)

    def im(i, idx, a, o, p, s):
        return (idx[i], 0, 0)

    row_spec = pl.BlockSpec((1, 1, v), im)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # idx, active, origins, pose, sign
        grid=(u,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]          # image
        + [row_spec] * 6,          # sdf, w, r, g, b, count rows
        out_specs=[row_spec] * 6 + [
            pl.BlockSpec((1, 1, 128),
                         lambda i, idx, a, o, p, s: (i, 0, 0)),
        ],
    )
    kern = functools.partial(
        _voxel_kernel, intr=intr, cfg=cfg, win=win, v_pad=v,
        with_color=with_color)
    row3 = jax.ShapeDtypeStruct((s1, 1, v), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[row3] * 6 + [
            jax.ShapeDtypeStruct((u, 1, 128), jnp.float32),
        ],
        # flat input indices incl. the 5 scalar-prefetch args:
        # img=5, sdf=6, w=7, r=8, g=9, b=10, cc=11 → outputs 0..5
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4, 11: 5},
        interpret=interpret,
    )(idx.astype(jnp.int32), active.astype(jnp.int32),
      origins_sel, world_to_cam, sign,
      img_packed, sdf.reshape(s1, 1, v), weight.reshape(s1, 1, v),
      color[:, :, 0].reshape(s1, 1, v), color[:, :, 1].reshape(s1, 1, v),
      color[:, :, 2].reshape(s1, 1, v), ccnt.reshape(s1, 1, v))
    sdf_n, w_n, cr_n, cg_n, cb_n, cc_n, q = out
    col_n = jnp.stack([cr_n[:, 0], cg_n[:, 0], cb_n[:, 0]], axis=-1)
    return (sdf_n.reshape(s1, v), w_n.reshape(s1, v),
            col_n, cc_n.reshape(s1, v),
            q[:, 0, 0], q[:, 0, 1] > 0.5)
