"""Texture patches: projecting chunk meshes into their selected keyframes.

TPU-native re-design of Patch/Chisel patch generation
(ref: Structure/Patch.cpp:40-108 CalculateTexCoords — project mesh
vertices into the chosen keyframe, texcoords + bbox; :88-96 wrong-mapping
detection (>30% of vertices with color Δ>0.6 or depth Δ>0.7);
Structure/Chisel.cpp:149-189 GeneratePatches).

The batched kernel processes U chunks at once with padded vertex arrays;
host code owns patch records and atlas placement (texture/atlas.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import TextureConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.core import se3


class PatchBatch(NamedTuple):
    uv: jnp.ndarray            # [U, P, 2] keyframe-image pixel coords
    uv_valid: jnp.ndarray      # [U, P] bool (in image, vertex valid)
    bbox_min: jnp.ndarray      # [U, 2]
    bbox_max: jnp.ndarray      # [U, 2]
    wrong_mapping: jnp.ndarray  # [U] bool
    tex_color: jnp.ndarray     # [U, P, 3] color sampled from the keyframe


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def project_patches(
    verts: jnp.ndarray,        # [U, P, 3] world-space chunk mesh vertices
    vert_valid: jnp.ndarray,   # [U, P]
    vert_color: jnp.ndarray,   # [U, P, 3] voxel colors from the mesher
    kf_pose: jnp.ndarray,      # [4, 4] selected keyframe camera-to-world
    kf_rgb: jnp.ndarray,       # [H, W, 3] — shared by all chunks in the batch
    kf_depth: jnp.ndarray,     # [H, W]
    intr: cam.Intrinsics,
    cfg: TextureConfig,
) -> PatchBatch:
    if kf_rgb.dtype == jnp.uint8:
        kf_rgb = kf_rgb.astype(jnp.float32) / 255.0
    world_to_cam = se3.inverse(kf_pose)
    pts_cam = se3.transform_points(world_to_cam, verts)             # [U,P,3]
    uv, z = cam.project(intr, pts_cam)
    in_img = cam.in_image(intr, uv, margin=1.0) & (z > intr.near)
    ok = vert_valid & in_img

    tex, _ = cam.bilinear_sample(kf_rgb, uv)                        # [U,P,3]
    d_kf, _ = cam.bilinear_sample(kf_depth, uv)                     # [U,P]

    color_bad = jnp.max(jnp.abs(tex - vert_color), axis=-1) > cfg.wrong_mapping_color
    depth_bad = jnp.abs(d_kf - z) > cfg.wrong_mapping_depth
    occluded = (d_kf > intr.near) & (z > d_kf + 0.05)  # vertex behind observed surface
    bad = ok & (color_bad | depth_bad | occluded)
    n_ok = jnp.maximum(jnp.sum(ok, axis=1), 1)
    wrong = (jnp.sum(bad, axis=1) / n_ok) > cfg.wrong_mapping_frac
    wrong = wrong | (jnp.sum(ok, axis=1) == 0)

    big = 1e9
    uv_masked = jnp.where(ok[..., None], uv, big)
    bbox_min = jnp.floor(jnp.min(uv_masked, axis=1) - 1.0)
    uv_masked = jnp.where(ok[..., None], uv, -big)
    bbox_max = jnp.ceil(jnp.max(uv_masked, axis=1) + 1.0)
    bbox_min = jnp.clip(bbox_min, 0, jnp.asarray([intr.width - 1, intr.height - 1]))
    bbox_max = jnp.clip(bbox_max, 0, jnp.asarray([intr.width - 1, intr.height - 1]))
    return PatchBatch(uv=uv, uv_valid=ok, bbox_min=bbox_min, bbox_max=bbox_max,
                      wrong_mapping=wrong, tex_color=tex)
