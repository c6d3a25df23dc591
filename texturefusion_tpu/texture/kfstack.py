"""Persistent device-resident keyframe image stacks for the texture stage.

The reference's texture passes read keyframe images straight from CPU
memory (ref: Structure/Patch.cpp:110-175 bilinear samplers over cv::Mat
ROIs; Chisel.cpp:149-189 GeneratePatches). Our equivalents sample them on
device — and re-stacking every keyframe's rgb/depth into fresh device
tensors each map cycle cost ~60 ms/cycle and grew with the map. Here each
keyframe is written ONCE into preallocated device buffers at integration
time:

  * rgb packed to one uint32/pixel (r | g<<8 | b<<16) — the projection
    kernel gathers a single word per bilinear tap instead of three f32
    channels, and no [K, H, W, 3] float conversion is ever materialized
  * depth stays f32 (wrong-mapping/occlusion tests need ~cm precision,
    ref: Patch.cpp:88-96)

Rows are indexed by keyframe slot; capacity grows by powers of two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnames=("rgbp", "depth"))
def _write_row(rgbp: jnp.ndarray, depth: jnp.ndarray, row: jnp.ndarray,
               rgb_u8: jnp.ndarray, d: jnp.ndarray):
    r = rgb_u8[..., 0].astype(jnp.uint32)
    g = rgb_u8[..., 1].astype(jnp.uint32)
    b = rgb_u8[..., 2].astype(jnp.uint32)
    packed = r | (g << 8) | (b << 16)
    return rgbp.at[row].set(packed), depth.at[row].set(d)


@functools.partial(jax.jit, static_argnames=("new_cap",))
def _grow(rgbp: jnp.ndarray, depth: jnp.ndarray, new_cap: int):
    k, h, w = rgbp.shape
    nr = jnp.zeros((new_cap, h, w), jnp.uint32).at[:k].set(rgbp)
    nd = jnp.zeros((new_cap, h, w), jnp.float32).at[:k].set(depth)
    return nr, nd


class KeyframeStack:
    def __init__(self, height: int, width: int, initial: int = 8):
        self.h, self.w = height, width
        self.cap = initial
        self.rgb_packed = jnp.zeros((initial, height, width), jnp.uint32)
        self.depth = jnp.zeros((initial, height, width), jnp.float32)
        self.poses = np.tile(np.eye(4, dtype=np.float32), (initial, 1, 1))
        self.present: set = set()

    def ensure(self, kf_slot: int) -> None:
        while kf_slot >= self.cap:
            self.cap *= 2
            self.rgb_packed, self.depth = _grow(self.rgb_packed, self.depth,
                                                self.cap)
            grown = np.tile(np.eye(4, dtype=np.float32), (self.cap, 1, 1))
            grown[: len(self.poses)] = self.poses
            self.poses = grown

    def add(self, kf_slot: int, rgb_u8, depth, pose: np.ndarray) -> None:
        """Write one keyframe's images (device arrays) + pose. Idempotent
        per slot — the row is written once, at integration time."""
        self.ensure(kf_slot)
        self.rgb_packed, self.depth = _write_row(
            self.rgb_packed, self.depth, jnp.int32(kf_slot),
            jnp.asarray(rgb_u8), jnp.asarray(depth))
        self.poses[kf_slot] = pose
        self.present.add(kf_slot)

    def set_pose(self, kf_slot: int, pose: np.ndarray) -> None:
        """Poses drift with BA; refresh before each texture cycle."""
        if kf_slot < self.cap:
            self.poses[kf_slot] = pose
