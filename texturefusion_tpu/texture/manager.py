"""Texture manager: view selection → patches → atlas → color compensation.

Host orchestration mirroring the texture stages of the reference's map
cycle (ref: GCFusion/MobileFusion.cpp:330-384 — wrong-mapping datacost
removal :330-343, texManager updates :356-359, view_selection :362-369,
GeneratePatches :374, CompensateColor :380, UpdateAtlas :382), driving the
batched device kernels in texture/{mrf,patch,color}.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import PipelineConfig
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.texture import color as color_ops
from texturefusion_tpu.texture import patch as patch_ops
from texturefusion_tpu.texture.atlas import Atlas
from texturefusion_tpu.texture.mrf import ViewSelector


def _bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ChunkTexture:
    __slots__ = ("label", "atlas_uv", "uv_valid", "color_adjust", "wrong",
                 "tex_color", "vox_color")

    def __init__(self):
        self.label = -1
        self.atlas_uv: Optional[np.ndarray] = None     # [P, 2] in [0,1]
        self.uv_valid: Optional[np.ndarray] = None     # [P]
        self.color_adjust: Optional[np.ndarray] = None  # [P, 3]
        self.wrong = False
        # cached per-vertex color samples for compensation (tex = sampled
        # from the keyframe at patch uv, vox = fused voxel colors)
        self.tex_color: Optional[np.ndarray] = None    # [P, 3]
        self.vox_color: Optional[np.ndarray] = None    # [P, 3]


class TextureManager:
    def __init__(self, config: PipelineConfig):
        self.config = config
        self.cfg = config.texture
        self.intr = cam.Intrinsics.from_config(config.camera)
        self.selector = ViewSelector(
            max_labels=self.cfg.max_labels,
            potts_weight=self.cfg.mrf_potts_weight,
            edge_weight=self.cfg.mrf_edge_weight,
            sweeps=self.cfg.mrf_sweeps)
        self.atlas = Atlas(self.cfg, config.tsdf.voxel_resolution)
        self.chunk_tex: Dict[int, ChunkTexture] = {}
        self._refresh_age: Dict[int, int] = {}   # slot -> last refresh cycle
        self._cycle_counter = 0

    # ------------------------------------------------------------- cycle

    def update(self, volume, mesher, kf_states: Dict[int, object],
               newest_kf: int, remeshed: Optional[set] = None) -> None:
        """One texture cycle: MRF view selection + projection of EVERY
        meshed chunk against its selected keyframe + color compensation
        run as ONE device program with ONE fetch
        (patch.texture_cycle_program); the host then applies atlas blits
        (label changes only) and uv bookkeeping under a per-cycle budget."""
        from texturefusion_tpu.utils.stopwatch import STOPWATCH
        with STOPWATCH.time("tex_adjacency"):
            adjacency = mesher.chunk_adjacency()
        if not adjacency:
            return
        with STOPWATCH.time("tex_build"):
            problem, slots, label_kf_np = self.selector.build_problem(
                volume.observations, adjacency, volume.ids, newest_kf)
            if problem is None:
                return
            n = problem.unary.shape[0]
            # node i ↔ chunk slot i; vertices come from the DEVICE mesh
            # pool inside the program — no host packing
            slot_idx = np.full(n, mesher.pool.verts.shape[0] - 1, np.int32)
            slot_idx[: len(slots)] = slots
            nv_of = {s: int(mesher.vcount[s]) for s in slots}
            # stacked keyframe buffers, slot-indexed (device u8 rgb)
            kb = _bucket(len(kf_states), lo=4)
            order = sorted(kf_states)
            poses = np.zeros((kb, 4, 4), np.float32)
            rgb_list, depth_list = [], []
            for kf in order:
                st = kf_states[kf]
                poses[kf] = st.pose
                rgb_list.append(jnp.asarray(st.rgb))
                depth_list.append(jnp.asarray(st.depth))
            while len(rgb_list) < kb:
                rgb_list.append(rgb_list[0])
                depth_list.append(depth_list[0])

        with STOPWATCH.time("tex_device"):
            out = patch_ops.texture_cycle_program(
                problem, jnp.asarray(slot_idx), mesher.pool.verts,
                mesher.pool.col_packed, mesher.pool.vcount,
                jnp.asarray(poses),
                jnp.stack(rgb_list), jnp.stack(depth_list),
                self.intr, self.cfg, self.cfg.mrf_sweeps)
            (sol, kf_id, uv16, uv_ok, bmin, bmax, wrong,
             t_np, mt_np, mv_np) = jax.device_get(tuple(out))

        with STOPWATCH.time("tex_host"):
            labels = self.selector.adopt_solution(slots, label_kf_np,
                                                  sol[: len(slots)],
                                                  newest_kf)
            # urgent = new patch or label change; refresh = remeshed uv
            # update, budgeted round-robin (ref incremental TexMap.cpp:
            # 257-406)
            urgent, refresh = [], []
            for i, s in enumerate(slots):
                kf = labels[s]
                if kf not in kf_states or nv_of.get(s, 0) == 0 or wrong[i]:
                    if wrong[i] and kf >= 0:
                        obs = volume.observations.get(s)
                        if obs is not None and kf in obs:
                            # poison so the MRF re-selects next cycle
                            # (ref: MobileFusion.cpp:330-343)
                            obs[kf] = -1e11
                        tex = self.chunk_tex.setdefault(s, ChunkTexture())
                        tex.wrong = True
                    continue
                tex = self.chunk_tex.get(s)
                if tex is None or tex.label != kf:
                    urgent.append(i)
                elif remeshed is not None and s in remeshed:
                    refresh.append(i)
            budget = max(self.cfg.patch_refresh_budget - len(urgent), 0)
            if len(refresh) > budget:
                refresh.sort(key=lambda i: self._refresh_age.get(slots[i], -1))
                refresh = refresh[:budget]
            self._cycle_counter += 1
            for i in urgent + refresh:
                s = slots[i]
                kf = labels[s]
                self._refresh_age[s] = self._cycle_counter
                tex = self.chunk_tex.setdefault(s, ChunkTexture())
                rec = self.atlas.patches.get(s)
                # refresh path must re-blit when the remeshed surface
                # outgrew the stored bbox — atlas_uv clamps against the
                # STORED bbox, so new vertices outside it would smear
                # into the tile edge
                escaped = (rec is not None and rec.kf_id == kf
                           and ((bmin[i] < rec.bbox_min - 0.5).any()
                                or (bmax[i] > rec.bbox_max + 0.5).any()))
                if rec is None or rec.kf_id != kf or escaped:
                    st = kf_states[kf]
                    rgb_host = (st.rgb_host() if hasattr(st, "rgb_host")
                                else st.rgb)
                    rec = self.atlas.add_or_update_patch(
                        s, kf, bmin[i], bmax[i], rgb_host)
                    if rec is None:
                        return  # atlas full — stop (ref: Atlas overflow)
                nv = nv_of[s]
                tex.label = kf
                tex.wrong = False
                tex.atlas_uv = self.atlas.atlas_uv(
                    s, uv16[i, :nv].astype(np.float32) / 16.0)
                tex.uv_valid = uv_ok[i, :nv]
            # per-keyframe color transfers for export-time baking
            self._kf_transfer = {
                kf: (t_np[kf], mt_np[kf], mv_np[kf])
                for kf in sorted(kf_states) if kf < len(t_np)
            }

    def bake_compensation_into_atlas(self) -> int:
        """Apply each patch's keyframe color transfer to its atlas tile so
        exported textures carry the global color consistency (the
        reference does this in the shader per vertex). Returns number of
        tiles baked."""
        transfers = getattr(self, "_kf_transfer", None)
        if not transfers:
            return 0
        n = 0
        ps = self.atlas.patch_size
        for slot, rec in self.atlas.patches.items():
            tr = transfers.get(rec.kf_id)
            if tr is None:
                continue
            t, mu_t, mu_v = tr
            ox, oy = self.atlas._slot_origin(rec.slot_index)
            tile = self.atlas.image[oy:oy + ps, ox:ox + ps].astype(np.float32) / 255.0
            fixed = (tile - mu_t) @ t.T + mu_v
            self.atlas.image[oy:oy + ps, ox:ox + ps] = np.clip(
                fixed * 255.0, 0, 255).astype(np.uint8)
            n += 1
        self._kf_transfer = None  # baked exactly once
        return n

    # ------------------------------------------------------------- export

    def export_textured(self, mesher, out_dir: str, name: str = "model") -> str:
        """Textured OBJ+MTL+PNG of all patched chunks
        (ref: Atlas.cpp:93-179)."""
        self.bake_compensation_into_atlas()
        vs, fs, uvs = [], [], []
        base = 0
        for slot in sorted(self.chunk_tex):
            tex = self.chunk_tex[slot]
            if tex.atlas_uv is None or slot not in mesher.meshes:
                continue
            v, f, c, n = mesher.meshes[slot]
            k = min(len(v), len(tex.atlas_uv))
            vs.append(v[:k])
            uvs.append(tex.atlas_uv[:k])
            f_ok = f[(f < k).all(axis=1)]
            fs.append(f_ok + base)
            base += k
        if not vs:
            raise RuntimeError("no textured chunks to export")
        return self.atlas.save_textured_model(
            out_dir, np.concatenate(vs), np.concatenate(fs),
            np.concatenate(uvs), name)
