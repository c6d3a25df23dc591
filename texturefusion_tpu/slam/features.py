"""Batched FAST + oriented-binary-descriptor feature extraction.

TPU-native equivalent of the reference's ORB-SLAM2 extractor driver
(ref: GCSLAM/ORBSLAM/ORBextractor.{h,cpp} — 8-level pyramid, scale 1.2,
FAST threshold 20, octree keypoint distribution, IC-angle orientation,
256-bit binary descriptors; driven from BasicAPI.cpp:175-279
detectAndExtractFeatures which also backprojects keypoints to 3D).

Re-design notes (SURVEY.md §7 phase 2, "hard parts" #3):
  * FAST segment test is evaluated for all pixels at once: 16 circle
    offsets → shifted images; a corner needs ≥9 contiguous brighter or
    darker samples, found with a rolled-window reduction.
  * The octree distribution becomes per-cell argmax (grid cells) + global
    top-K, which keeps shapes static.
  * Descriptors use our own deterministic 256-pair pattern (seeded
    Gaussian, like rBRIEF's learned pattern in spirit); we only match our
    own descriptors so bit-compatibility with OpenCV is irrelevant, while
    Hamming thresholds keep the reference's semantics (≤50 of 256).
  * Keypoints are padded to a static capacity with validity masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import TrackingConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.ops import hamming

# FAST circle of radius 3 (standard 16-offset Bresenham circle), (dx, dy)
_FAST_OFFSETS = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)


def _descriptor_pattern(n_bits: int = 256, radius: int = 13,
                        seed: int = 7) -> np.ndarray:
    """Deterministic sampling pattern: n_bits point pairs within a disc.
    Shape [n_bits, 4] = (x1, y1, x2, y2)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, radius / 2.5, size=(n_bits, 4))
    return np.clip(pts, -radius, radius).astype(np.float32)


_PATTERN = _descriptor_pattern()


class Keypoints(NamedTuple):
    uv: jnp.ndarray        # [K, 2] pixel coords at level-0 scale
    response: jnp.ndarray  # [K]
    angle: jnp.ndarray     # [K] radians
    level: jnp.ndarray     # [K] int32 pyramid level
    desc: jnp.ndarray      # [K, 8] uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # [K] bool
    points3d: jnp.ndarray  # [K, 3] camera-frame backprojection (0 if no depth)
    has_depth: jnp.ndarray  # [K] bool


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    padded = jnp.pad(img, (pad_y, pad_x), mode="edge")
    h, w = img.shape
    return jax.lax.dynamic_slice(padded, (pad_y[0] + dy, pad_x[0] + dx), (h, w))


def fast_score(gray: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner response for every pixel (0 for non-corners).

    The 16 circle samples are bit-packed into one int32 per pixel so the
    "contiguous arc ≥ 9" test becomes 16 shift/mask compares on the VPU
    instead of 144 boolean-array ANDs (the popcnt-style trick the
    reference's AVX path plays with movemask)."""
    bits_b = jnp.zeros(gray.shape, jnp.int32)
    bits_d = jnp.zeros(gray.shape, jnp.int32)
    score = jnp.zeros(gray.shape, gray.dtype)
    for i, (dx, dy) in enumerate(_FAST_OFFSETS):
        diff = _shift2d(gray, int(dy), int(dx)) - gray
        bits_b = bits_b | (diff > threshold).astype(jnp.int32) << i
        bits_d = bits_d | (diff < -threshold).astype(jnp.int32) << i
        score = score + jnp.maximum(jnp.abs(diff) - threshold, 0.0)
    # wrap the circular 16 bits to 32 so every window start is a plain shift
    wrap_b = bits_b | (bits_b << 16)
    wrap_d = bits_d | (bits_d << 16)
    need = (1 << 9) - 1
    is_corner = jnp.zeros(gray.shape, bool)
    for s in range(16):
        is_corner = is_corner | (((wrap_b >> s) & need) == need) \
                              | (((wrap_d >> s) & need) == need)
    return jnp.where(is_corner, score, 0.0)


def _nms(score: jnp.ndarray) -> jnp.ndarray:
    """3×3 non-maximum suppression."""
    neigh = jnp.stack([_shift2d(score, dy, dx)
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                       if (dy, dx) != (0, 0)], axis=0)
    return jnp.where(score >= jnp.max(neigh, axis=0), score, 0.0)


def _box_blur(img: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Separable box blur (descriptor smoothing, like ORB's GaussianBlur)."""
    k = 2 * r + 1
    out = img
    for axis in (0, 1):
        acc = jnp.zeros_like(out)
        for s in range(-r, r + 1):
            acc = acc + (jnp.roll(out, s, axis))
        out = acc / k
    return out


# Patch geometry: descriptor taps reach |xy| ≤ 13 after rotation
# (pattern clip) and the IC-angle disc has radius 11, so a 32×32 patch
# centered at (15, 15) covers both with margin. The per-level border mask
# (16 px) guarantees patches never leave the image.
_PATCH = 32
_PATCH_C = 15
_IC_RADIUS = 11


def _ic_weights() -> Tuple[np.ndarray, np.ndarray]:
    yy, xx = np.mgrid[0:_PATCH, 0:_PATCH]
    dx = (xx - _PATCH_C).astype(np.float32)
    dy = (yy - _PATCH_C).astype(np.float32)
    disc = (dx * dx + dy * dy) <= _IC_RADIUS * _IC_RADIUS
    return np.where(disc, dx, 0.0), np.where(disc, dy, 0.0)


_IC_DX, _IC_DY = _ic_weights()


def _extract_patches(blur: jnp.ndarray, vy: jnp.ndarray,
                     vx: jnp.ndarray) -> jnp.ndarray:
    """[K, 32, 32] patches around integer keypoint centers.

    One batched gather instead of per-keypoint work: everything
    downstream (orientation, descriptor taps) then runs on [K, 1024]
    on-chip data — the TPU answer to the reference's per-keypoint
    IC_Angle/descriptor loops (ref: ORBextractor.cpp)."""
    y0 = vy.astype(jnp.int32) - _PATCH_C
    x0 = vx.astype(jnp.int32) - _PATCH_C

    def one(y, x):
        return jax.lax.dynamic_slice(blur, (y, x), (_PATCH, _PATCH))

    return jax.vmap(one)(y0, x0)


def _ic_angle_patch(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation from the patch
    (ref: ORBextractor IC_Angle semantics)."""
    m10 = jnp.sum(patches * jnp.asarray(_IC_DX), axis=(1, 2))
    m01 = jnp.sum(patches * jnp.asarray(_IC_DY), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _descriptors_patch(patches: jnp.ndarray,
                       angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated point-pair comparisons → packed [K, 8] uint32.

    Taps are nearest-rounded inside the patch (the reference ORB also
    rounds, ORBextractor.cpp GET_VALUE) and fetched with a single
    batched take_along_axis on [K, 1024] — no full-image gathers."""
    pat = jnp.asarray(_PATTERN)                          # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)              # [K]
    xy = jnp.stack([jnp.concatenate([pat[:, 0], pat[:, 2]]),
                    jnp.concatenate([pat[:, 1], pat[:, 3]])], axis=0)  # [2,512]
    rx = ca[:, None] * xy[0][None] - sa[:, None] * xy[1][None] + _PATCH_C
    ry = sa[:, None] * xy[0][None] + ca[:, None] * xy[1][None] + _PATCH_C
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32), 0, _PATCH - 1)
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32), 0, _PATCH - 1)
    flat = iy * _PATCH + ix                              # [K, 512]
    vals = jnp.take_along_axis(patches.reshape(patches.shape[0], -1),
                               flat, axis=1)
    v1, v2 = vals[:, :256], vals[:, 256:]
    return hamming.pack_bits(v1 < v2)


@functools.partial(jax.jit, static_argnames=("cfg", "intr"))
def extract_features(gray: jnp.ndarray, depth: jnp.ndarray,
                     cfg: TrackingConfig, intr: cam.Intrinsics) -> Keypoints:
    """Detect, orient, describe and backproject up to cfg.max_features_pad
    keypoints across the image pyramid."""
    k_total = cfg.max_features_pad
    n_levels = cfg.pyramid_levels
    inv_scale = 1.0 / cfg.pyramid_scale

    # per-level keypoint budget ∝ scale (like ORB-SLAM's distribution)
    weights = np.power(inv_scale, np.arange(n_levels))
    weights /= weights.sum()
    budgets = np.maximum((weights * k_total).astype(int), 8)
    # make budgets sum exactly to k_total
    budgets[0] += k_total - budgets.sum()

    levels_uv, levels_resp, levels_ang, levels_desc, levels_ok, levels_id = \
        [], [], [], [], [], []
    img = gray
    scale = 1.0
    h0, w0 = gray.shape
    for lvl in range(n_levels):
        if lvl > 0:
            nh = max(int(round(h0 * inv_scale ** lvl)), 32)
            nw = max(int(round(w0 * inv_scale ** lvl)), 32)
            # resize recursively from the previous level (like
            # ORB-SLAM's pyramid, ref: ORBextractor ComputePyramid) —
            # geometric input sizes instead of 7 full-image resizes
            img = jax.image.resize(img, (nh, nw), "linear")
            scale = w0 / nw
        score = _nms(fast_score(img, cfg.fast_threshold))
        # kill border responses (descriptor patch must fit)
        border = 16
        h, w = score.shape
        mask = jnp.zeros((h, w), bool).at[border:h - border, border:w - border].set(True)
        score = jnp.where(mask, score, 0.0)

        # two-stage selection replacing the 307k-element global top-k
        # (big device sorts are slow): (1) per-cell argmax — a pure
        # reduction — collapses the score map to ~4× budget spatially
        # spread candidates; (2) a cheap top-k over that small winner set
        # keeps the strongest. Together these play the role of the
        # reference's octree distribution (ref: ORBextractor
        # DistributeOctTree): spread AND strength.
        k = int(budgets[lvl])
        n_cells = k * 4
        gy = max(int(np.floor(np.sqrt(n_cells * h / w))), 1)
        gx = max(n_cells // gy, 1)
        cell_h = -(-h // gy)
        cell_w = -(-w // gx)
        pad_h = gy * cell_h - h
        pad_w = gx * cell_w - w
        sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
        cells = sp.reshape(gy, cell_h, gx, cell_w).transpose(0, 2, 1, 3)
        cells = cells.reshape(gy * gx, cell_h * cell_w)
        ci = jnp.argmax(cells, axis=1)
        cell_resp = jnp.take_along_axis(cells, ci[:, None], axis=1)[:, 0]
        cy = jnp.arange(gy * gx) // gx
        cx = jnp.arange(gy * gx) % gx
        wy = (cy * cell_h + ci // cell_w).astype(jnp.float32)
        wx = (cx * cell_w + ci % cell_w).astype(jnp.float32)
        k = min(k, gy * gx)
        resp, win = jax.lax.top_k(cell_resp, k)
        vy = wy[win]
        vx = wx[win]
        ok = resp > 0
        uv_l = jnp.stack([vx, vy], axis=-1)
        blur = _box_blur(img)
        patches = _extract_patches(blur, vy, vx)
        ang = _ic_angle_patch(patches)
        desc = _descriptors_patch(patches, ang)
        levels_uv.append(uv_l * scale)
        levels_resp.append(resp)
        levels_ang.append(ang)
        levels_desc.append(desc)
        levels_ok.append(ok)
        levels_id.append(jnp.full((k,), lvl, jnp.int32))

    uv = jnp.concatenate(levels_uv)
    response = jnp.concatenate(levels_resp)
    angle = jnp.concatenate(levels_ang)
    desc = jnp.concatenate(levels_desc)
    valid = jnp.concatenate(levels_ok)
    level = jnp.concatenate(levels_id)

    # backproject to 3D with the (refined) depth map
    # (ref: BasicAPI.cpp:257-279). Depth lookup happens at the RAW pixel
    # (the depth image is as-distorted as the rgb); the backprojection
    # and the downstream 2D reprojection checks use UNDISTORTED coords
    # (ref: BasicAPI.cpp:195-241 cv::undistortPoints on every keypoint)
    d, dmask = cam.nearest_sample(depth, uv)
    has_depth = valid & dmask & (d > intr.near) & (d < intr.far)
    uv_ideal = cam.undistort_points(intr, uv)
    pts = cam.unproject(intr, uv_ideal[:, 0], uv_ideal[:, 1], d)
    pts = jnp.where(has_depth[:, None], pts, 0.0)
    return Keypoints(uv=uv_ideal, response=response, angle=angle, level=level,
                     desc=desc, valid=valid, points3d=pts, has_depth=has_depth)
