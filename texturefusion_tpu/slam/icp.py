"""Projective dense ICP: depth-map alignment and ICP edge correspondences.

Capability parity with the reference's optional ICP registration path
(ref: settings.yaml use_icp_registration / icp_weight:0.5;
FrameCorrespondence::preIntegrateICP MultiViewGeometry.h:162-231 folds
dense geometric terms into the BA pre-integration) — re-designed as a
batched projective point-plane GN over subsampled depth maps.

Convention matches slam/matching.py: the estimated pose maps source-frame
points into the reference frame, p_ref ≈ T · p_src.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.core import se3

_PREC = jax.lax.Precision.HIGHEST


class ICPResult(NamedTuple):
    pose: jnp.ndarray        # refined [4, 4]
    rmse: jnp.ndarray        # point-plane residual RMS over inliers
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("intr", "stride", "iters"))
def icp_refine(depth_ref: jnp.ndarray, normals_ref: jnp.ndarray,
               depth_src: jnp.ndarray, pose_init: jnp.ndarray,
               intr: cam.Intrinsics, stride: int = 4, iters: int = 8,
               max_dist: float = 0.1, min_cos: float = 0.6) -> ICPResult:
    """Point-plane projective ICP: refine T s.t. p_ref ≈ T · p_src.

    Each iteration projects the (subsampled) source cloud into the
    reference frame, looks up the reference point+normal at the projected
    pixel, and solves the 6×6 point-plane normal equations in closed form.
    """
    src = cam.backproject_depth_map(intr, depth_src)[::stride, ::stride]
    src = src.reshape(-1, 3)
    src_valid = depth_src[::stride, ::stride].reshape(-1) > 0

    pts_ref_map = cam.backproject_depth_map(intr, depth_ref)

    def gn_iter(_, pose):
        x = se3.transform_points(pose, src)                      # [N, 3]
        uv, z = cam.project(intr, x)
        ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, intr.width - 1)
        vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, intr.height - 1)
        p_ref = pts_ref_map[vi, ui]
        n_ref = normals_ref[vi, ui]
        ok = (src_valid & cam.in_image(intr, uv) & (z > intr.near)
              & (p_ref[..., 2] > intr.near)
              & (jnp.sum(n_ref * n_ref, axis=-1) > 0.5))
        diff = x - p_ref
        ok = ok & (jnp.linalg.norm(diff, axis=-1) < max_dist)
        # normal-compatibility gate
        view = -x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        ok = ok & (jnp.sum(n_ref * view, axis=-1) > -1.0)  # ref normals face camera
        r = jnp.sum(n_ref * diff, axis=-1)                       # point-plane
        w = jnp.where(ok, 1.0, 0.0)
        # J row: [nᵀ, (x × n)ᵀ] for left-perturbation ξ=[ρ, ω]
        cx = jnp.cross(x, n_ref)
        j6 = jnp.concatenate([n_ref, cx], axis=-1)               # [N, 6]
        h = jnp.einsum("n,ni,nj->ij", w, j6, j6, precision=_PREC)
        b = jnp.einsum("n,ni,n->i", w, j6, r, precision=_PREC)
        h = h + jnp.eye(6) * 1e-6
        xi = -jnp.linalg.solve(h, b)
        xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
        return se3.compose(se3.se3_exp(xi), pose)

    pose = jax.lax.fori_loop(0, iters, gn_iter, pose_init)

    # final statistics
    x = se3.transform_points(pose, src)
    uv, z = cam.project(intr, x)
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, intr.width - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, intr.height - 1)
    p_ref = pts_ref_map[vi, ui]
    n_ref = normals_ref[vi, ui]
    ok = (src_valid & cam.in_image(intr, uv)
          & (p_ref[..., 2] > intr.near)
          & (jnp.sum(n_ref * n_ref, axis=-1) > 0.5)
          & (jnp.linalg.norm(x - p_ref, axis=-1) < max_dist))
    r = jnp.sum(n_ref * (x - p_ref), axis=-1)
    n_inl = jnp.sum(ok)
    rmse = jnp.sqrt(jnp.sum(jnp.where(ok, r * r, 0.0)) / jnp.maximum(n_inl, 1))
    success = (n_inl > src.shape[0] * 0.2) & (rmse < 0.02) \
        & jnp.all(jnp.isfinite(pose))
    return ICPResult(pose=pose, rmse=rmse, n_inliers=n_inl.astype(jnp.int32),
                     success=success)


@functools.partial(jax.jit, static_argnames=("intr", "stride"))
def icp_correspondences(depth_ref: jnp.ndarray, depth_src: jnp.ndarray,
                        pose: jnp.ndarray, intr: cam.Intrinsics,
                        stride: int = 8, max_dist: float = 0.05
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense projective correspondences (p_ref, q_src, weight) for folding
    geometric terms into FastBA edges (capability of preIntegrateICP,
    ref: MultiViewGeometry.h:162-231). Static-size outputs."""
    q = cam.backproject_depth_map(intr, depth_src)[::stride, ::stride].reshape(-1, 3)
    q_valid = depth_src[::stride, ::stride].reshape(-1) > 0
    x = se3.transform_points(pose, q)
    uv, z = cam.project(intr, x)
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, intr.width - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, intr.height - 1)
    p = cam.backproject_depth_map(intr, depth_ref)[vi, ui]
    ok = (q_valid & cam.in_image(intr, uv) & (p[..., 2] > intr.near)
          & (jnp.linalg.norm(x - p, axis=-1) < max_dist))
    return p, q, jnp.where(ok, 1.0, 0.0)
