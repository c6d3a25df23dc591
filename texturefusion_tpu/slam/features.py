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
    """FAST-9/16 corner response for every pixel (0 for non-corners)."""
    diffs = jnp.stack(
        [_shift2d(gray, int(dy), int(dx)) - gray for dx, dy in _FAST_OFFSETS],
        axis=0)                                           # [16, H, W]
    brighter = diffs > threshold
    darker = diffs < -threshold
    # contiguous arc of length >= 9 in the circular 16: OR over the 16
    # rotations of an AND over a 9-window
    wrap_b = jnp.concatenate([brighter, brighter[:8]], axis=0)
    wrap_d = jnp.concatenate([darker, darker[:8]], axis=0)
    arc_b = jnp.stack([jnp.all(wrap_b[s:s + 9], axis=0) for s in range(16)]).any(0)
    arc_d = jnp.stack([jnp.all(wrap_d[s:s + 9], axis=0) for s in range(16)]).any(0)
    is_corner = arc_b | arc_d
    score = jnp.sum(jnp.maximum(jnp.abs(diffs) - threshold, 0.0), axis=0)
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


def _moment_maps(blur: jnp.ndarray, radius: int = 11):
    """Whole-image intensity-centroid moments m10/m01 via two depthwise
    convolutions — O(HW·P) shared across all keypoints instead of
    per-keypoint patch gathers (the reference computes IC_Angle per
    keypoint serially; ref: ORBextractor IC_Angle)."""
    offs = np.asarray([(dy, dx) for dy in range(-radius, radius + 1)
                       for dx in range(-radius, radius + 1)
                       if dx * dx + dy * dy <= radius * radius], np.float32)
    size = 2 * radius + 1
    kx = np.zeros((size, size), np.float32)
    ky = np.zeros((size, size), np.float32)
    for dy, dx in offs:
        kx[int(dy) + radius, int(dx) + radius] = dx
        ky[int(dy) + radius, int(dx) + radius] = dy
    img = blur[None, None]

    def conv(kernel):
        # cross-correlation: m(y,x) = Σ I(y+dy, x+dx)·w(dy,dx)
        k = jnp.asarray(kernel[::-1, ::-1])[None, None]
        return jax.lax.conv_general_dilated(
            img, k, (1, 1), "SAME")[0, 0]

    return conv(kx), conv(ky)


def _ic_angle(blur: jnp.ndarray, uv: jnp.ndarray, radius: int = 11) -> jnp.ndarray:
    """Intensity-centroid orientation (ref: ORBextractor IC_Angle),
    via precomputed moment maps + one bilinear sample per keypoint."""
    m10_map, m01_map = _moment_maps(blur, radius)
    m10, _ = cam.bilinear_sample(m10_map, uv)
    m01, _ = cam.bilinear_sample(m01_map, uv)
    return jnp.arctan2(m01, m10)


def _descriptors(blur: jnp.ndarray, uv: jnp.ndarray,
                 angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated point-pair comparisons -> packed [K, 8] uint32."""
    pat = jnp.asarray(_PATTERN)                          # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)              # [K]

    def rot(x, y):
        return (ca[:, None] * x[None] - sa[:, None] * y[None],
                sa[:, None] * x[None] + ca[:, None] * y[None])

    x1, y1 = rot(pat[:, 0], pat[:, 1])
    x2, y2 = rot(pat[:, 2], pat[:, 3])
    p1 = uv[:, None, :] + jnp.stack([x1, y1], axis=-1)
    p2 = uv[:, None, :] + jnp.stack([x2, y2], axis=-1)
    v1, _ = cam.bilinear_sample(blur, p1)
    v2, _ = cam.bilinear_sample(blur, p2)
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
            img = jax.image.resize(gray, (nh, nw), "linear")
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
        ang = _ic_angle(blur, uv_l)
        desc = _descriptors(blur, uv_l, ang)
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
    # (ref: BasicAPI.cpp:257-279)
    d, dmask = cam.nearest_sample(depth, uv)
    has_depth = valid & dmask & (d > intr.near) & (d < intr.far)
    pts = cam.unproject(intr, uv[:, 0], uv[:, 1], d)
    pts = jnp.where(has_depth[:, None], pts, 0.0)
    return Keypoints(uv=uv, response=response, angle=angle, level=level,
                     desc=desc, valid=valid, points3d=pts, has_depth=has_depth)
