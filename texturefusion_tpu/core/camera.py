"""Pinhole camera model and frustum tests, batched jnp.

Replaces open_chisel's PinholeCamera/Frustum (ref:
open_chisel/camera/PinholeCamera.h:33-63, open_chisel/geometry/Frustum.cpp)
and the projection math inside voxelUpdateSIMD
(ref: open_chisel/utils/ProjectionIntegrator.cpp:67-426).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from texturefusion_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Static camera intrinsics as a jit-friendly NamedTuple of scalars.

    d0-d4 are the Brown-Conrady distortion coefficients (k1, k2, p1, p2,
    k3) from the 13-field calib.txt (ref: BasicAPI.cpp:1108-1133); all
    zero for rectified input."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    near: float
    far: float
    d0: float = 0.0
    d1: float = 0.0
    d2: float = 0.0
    d3: float = 0.0
    d4: float = 0.0

    @classmethod
    def from_config(cls, cam: CameraConfig) -> "Intrinsics":
        return cls(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                   width=cam.width, height=cam.height,
                   near=cam.near_plane, far=cam.far_plane,
                   d0=cam.d0, d1=cam.d1, d2=cam.d2, d3=cam.d3, d4=cam.d4)

    @property
    def has_distortion(self) -> bool:
        return any(abs(d) > 1e-12
                   for d in (self.d0, self.d1, self.d2, self.d3, self.d4))

    def scaled(self, factor: float) -> "Intrinsics":
        """Intrinsics for an image resized by `factor` (pyramid levels)."""
        return Intrinsics(
            fx=self.fx * factor, fy=self.fy * factor,
            cx=(self.cx + 0.5) * factor - 0.5, cy=(self.cy + 0.5) * factor - 0.5,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
            near=self.near, far=self.far,
            d0=self.d0, d1=self.d1, d2=self.d2, d3=self.d3, d4=self.d4,
        )


def project(intr: Intrinsics, pts_cam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (..., 3) -> pixel coords (..., 2) [u, v] and depth (...,).

    Matches the reference's projection u = fx·x/z + cx (ref:
    ProjectionIntegrator.cpp voxel projection; PinholeCamera::ProjectPoint).
    """
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr.fx * pts_cam[..., 0] / safe_z + intr.cx
    v = intr.fy * pts_cam[..., 1] / safe_z + intr.cy
    return jnp.stack([u, v], axis=-1), z


def unproject(intr: Intrinsics, u: jnp.ndarray, v: jnp.ndarray,
              depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel grid + depth -> camera-frame points (..., 3).

    Matches keypoint backprojection (ref: BasicAPI.cpp:257-279)."""
    x = (u - intr.cx) / intr.fx * depth
    y = (v - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(intr: Intrinsics, x: jnp.ndarray, y: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward Brown-Conrady model on normalized camera coords:
    (x, y) undistorted → distorted. k1=d0, k2=d1, p1=d2, p2=d3, k3=d4."""
    r2 = x * x + y * y
    radial = 1.0 + r2 * (intr.d0 + r2 * (intr.d1 + r2 * intr.d4))
    xd = x * radial + 2.0 * intr.d2 * x * y + intr.d3 * (r2 + 2.0 * x * x)
    yd = y * radial + intr.d2 * (r2 + 2.0 * y * y) + 2.0 * intr.d3 * x * y
    return xd, yd


def undistort_points(intr: Intrinsics, uv: jnp.ndarray,
                     iterations: int = 8) -> jnp.ndarray:
    """Undistort pixel coords (..., 2) by iterating the inverse Brown
    model — the reference undistorts every keypoint when the calibration
    carries distortion (ref: BasicAPI.cpp:195-241, cv::undistortPoints
    at :226, which uses the same fixed-point iteration). Returns pixel
    coords under the ideal pinhole model. No-op when all d coefficients
    are zero (checked at trace time — zero cost for rectified input)."""
    if not intr.has_distortion:
        return uv
    xd = (uv[..., 0] - intr.cx) / intr.fx
    yd = (uv[..., 1] - intr.cy) / intr.fy
    x, y = xd, yd
    for _ in range(iterations):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (intr.d0 + r2 * (intr.d1 + r2 * intr.d4))
        dx = 2.0 * intr.d2 * x * y + intr.d3 * (r2 + 2.0 * x * x)
        dy = intr.d2 * (r2 + 2.0 * y * y) + 2.0 * intr.d3 * x * y
        safe = jnp.where(jnp.abs(radial) > 1e-8, radial, 1e-8)
        x = (xd - dx) / safe
        y = (yd - dy) / safe
    return jnp.stack([x * intr.fx + intr.cx, y * intr.fy + intr.cy], axis=-1)


def pixel_grid(intr: Intrinsics, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W) meshgrid of pixel u (x) and v (y) coordinates."""
    v, u = jnp.meshgrid(
        jnp.arange(intr.height, dtype=dtype),
        jnp.arange(intr.width, dtype=dtype),
        indexing="ij",
    )
    return u, v


def backproject_depth_map(intr: Intrinsics, depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) camera-frame point map."""
    u, v = pixel_grid(intr, depth.dtype)
    return unproject(intr, u, v, depth)


def in_image(intr: Intrinsics, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Validity mask for pixel coords (..., 2)."""
    u, v = uv[..., 0], uv[..., 1]
    return ((u >= margin) & (u <= intr.width - 1 - margin)
            & (v >= margin) & (v <= intr.height - 1 - margin))


def bilinear_sample(image: jnp.ndarray, uv: jnp.ndarray,
                    valid_min: float = -jnp.inf) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear sample of (H, W) or (H, W, C) image at (..., 2) [u, v].

    Returns (values, in-bounds mask). Matches Patch::bilinear
    (ref: Structure/Patch.cpp:110-170). Samples outside return 0.
    """
    h, w = image.shape[0], image.shape[1]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    mask = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u0c = jnp.clip(u0, 0, w - 2)
    v0c = jnp.clip(v0, 0, h - 2)
    # fractions relative to the clamped base so edge samples stay exact
    du = u - u0c.astype(u.dtype)
    dv = v - v0c.astype(v.dtype)
    if image.ndim == 3:
        du, dv = du[..., None], dv[..., None]

    def at(dy, dx):
        return image[v0c + dy, u0c + dx]

    top = at(0, 0) * (1 - du) + at(0, 1) * du
    bot = at(1, 0) * (1 - du) + at(1, 1) * du
    val = top * (1 - dv) + bot * dv
    if image.ndim == 3:
        val = jnp.where(mask[..., None], val, 0.0)
    else:
        val = jnp.where(mask, val, 0.0)
    return val, mask


def nearest_sample(image: jnp.ndarray, uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-neighbor sample of (H, W[, C]) at (..., 2) [u, v]."""
    h, w = image.shape[0], image.shape[1]
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    mask = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    val = image[jnp.clip(v, 0, h - 1), jnp.clip(u, 0, w - 1)]
    if image.ndim == 3:
        val = jnp.where(mask[..., None], val, 0)
    else:
        val = jnp.where(mask, val, 0)
    return val, mask
