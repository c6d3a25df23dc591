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
        """One texture cycle over the current mesh."""
        from texturefusion_tpu.utils.stopwatch import STOPWATCH
        with STOPWATCH.time("tex_adjacency"):
            adjacency = mesher.chunk_adjacency()
        if not adjacency:
            return
        with STOPWATCH.time("tex_select"):
            labels = self.selector.select(volume.observations, adjacency,
                                          volume.ids, newest_kf)

        # chunks needing patch regeneration: label changed or remeshed.
        # Urgent work (no patch yet / label changed) always runs; uv
        # refreshes of merely-remeshed chunks are budgeted per cycle with
        # round-robin catch-up, keeping texture cost flat as the map
        # grows (ref TexMap.cpp:257-406 runs an incremental variant for
        # the same reason).
        urgent, refresh = [], []
        for slot, kf in labels.items():
            if kf not in kf_states:
                continue
            tex = self.chunk_tex.get(slot)
            if tex is None or tex.label != kf:
                urgent.append((slot, kf))
            elif remeshed is not None and slot in remeshed:
                refresh.append((slot, kf))
        budget = max(self.cfg.patch_refresh_budget - len(urgent), 0)
        if len(refresh) > budget:
            refresh.sort(key=lambda sk: self._refresh_age.get(sk[0], -1))
            refresh = refresh[:budget]
        todo = urgent + refresh
        self._cycle_counter += 1
        for slot, _ in todo:
            self._refresh_age[slot] = self._cycle_counter

        with STOPWATCH.time("tex_patches"):
            self._generate_patches_multi(todo, mesher, kf_states, volume)

        with STOPWATCH.time("tex_compensate"):
            self._compensate_color(mesher, kf_states)

    def _generate_patches_multi(self, todo, mesher, kf_states, volume) -> None:
        """Patch generation for chunks labeled with MANY keyframes in ONE
        dispatch + ONE fetch (project_patches_multi): the per-view loop
        of the reference (Chisel.cpp:149-189) would cost a ~30-60 ms
        dispatch+sync per view here."""
        todo = [(s, kf) for s, kf in todo if s in mesher.meshes]
        if not todo:
            return
        kfs = sorted({kf for _, kf in todo})
        lb = _bucket(len(kfs), lo=2)
        kf_of_row = {kf: i for i, kf in enumerate(kfs)}
        poses = np.zeros((lb, 4, 4), np.float32)
        rgb_list, depth_list = [], []
        for kf in kfs:
            st = kf_states[kf]
            poses[kf_of_row[kf]] = st.pose
            rgb_list.append(jnp.asarray(st.rgb))
            depth_list.append(jnp.asarray(st.depth))
        while len(rgb_list) < lb:
            rgb_list.append(rgb_list[0])
            depth_list.append(depth_list[0])
        kf_rgbs = jnp.stack(rgb_list)
        kf_depths = jnp.stack(depth_list)

        meshes = [mesher.meshes[s] for s, _ in todo]
        pmax = _bucket(max(len(m[0]) for m in meshes))
        ub = _bucket(len(todo), lo=32)
        verts = np.zeros((ub, pmax, 3), np.float32)
        valid = np.zeros((ub, pmax), bool)
        vcol = np.zeros((ub, pmax, 3), np.float32)
        rows = np.zeros(ub, np.int32)
        for i, ((slot, kf), (v, f, c, n)) in enumerate(zip(todo, meshes)):
            k = len(v)
            verts[i, :k] = v
            valid[i, :k] = True
            vcol[i, :k] = c
            rows[i] = kf_of_row[kf]
        batch = patch_ops.project_patches_multi(
            jnp.asarray(verts), jnp.asarray(valid), jnp.asarray(vcol),
            jnp.asarray(rows), jnp.asarray(poses), kf_rgbs, kf_depths,
            self.intr, self.cfg)
        uv, uv_ok, bmin, bmax, wrong, tex_c = jax.device_get(
            (batch.uv, batch.uv_valid, batch.bbox_min, batch.bbox_max,
             batch.wrong_mapping, batch.tex_color))

        for i, (slot, kf) in enumerate(todo):
            tex = self.chunk_tex.setdefault(slot, ChunkTexture())
            if wrong[i]:
                # wrong mapping: poison this keyframe's observation so the
                # MRF picks another view next cycle
                # (ref: MobileFusion.cpp:330-343)
                obs = volume.observations.get(slot)
                if obs is not None and kf in obs:
                    obs[kf] = -1e11
                tex.wrong = True
                continue
            rec = self.atlas.patches.get(slot)
            if rec is None or rec.kf_id != kf:
                st = kf_states[kf]
                rgb_host = (st.rgb_host() if hasattr(st, "rgb_host")
                            else st.rgb)
                rec = self.atlas.add_or_update_patch(
                    slot, kf, bmin[i], bmax[i], rgb_host)
                if rec is None:
                    return  # atlas full — stop (ref: Atlas overflow)
            n_verts = len(meshes[i][0])
            tex.label = kf
            tex.wrong = False
            tex.atlas_uv = self.atlas.atlas_uv(slot, uv[i, :n_verts])
            tex.uv_valid = uv_ok[i, :n_verts]
            tex.tex_color = tex_c[i, :n_verts]
            tex.vox_color = meshes[i][2]

    def _compensate_color(self, mesher, kf_states) -> None:
        """Global color transfer per keyframe cluster
        (ref: Chisel.cpp:198-286 CompensateColor). Also records the
        per-keyframe transfer so export can bake it into the atlas (the
        reference applies it per-vertex in the shader,
        draw_mesh.vert:29-70).

        Consumes the per-vertex texture/voxel color samples CACHED by
        patch generation (sampled on device from the keyframe image) —
        no per-chunk atlas reads. Shapes pad to buckets so the cluster
        kernels compile once per size class."""
        samples_tex, samples_vox, clusters, owners, weights = \
            [], [], [], [], []
        kf_row = {}
        for slot, tex in list(self.chunk_tex.items()):
            if (tex.label < 0 or tex.wrong or tex.tex_color is None
                    or tex.vox_color is None):
                continue
            if tex.label not in kf_states:
                continue
            if tex.label not in kf_row:
                kf_row[tex.label] = len(kf_row)
            n_verts = min(len(tex.tex_color), len(tex.vox_color))
            samples_tex.append(tex.tex_color[:n_verts])
            samples_vox.append(tex.vox_color[:n_verts])
            clusters.append(np.full(n_verts, kf_row[tex.label], np.int32))
            weights.append(tex.uv_valid[:n_verts].astype(np.float32))
            owners.append((slot, n_verts))
        if not samples_tex:
            return
        tex_all = np.concatenate(samples_tex)
        vox_all = np.concatenate(samples_vox)
        cl_all = np.concatenate(clusters)
        w_all = np.concatenate(weights)
        n = len(tex_all)
        nb = _bucket(n, lo=4096)
        pad = nb - n
        tex_j = jnp.asarray(np.concatenate(
            [tex_all, np.zeros((pad, 3), np.float32)]))
        vox_j = jnp.asarray(np.concatenate(
            [vox_all, np.zeros((pad, 3), np.float32)]))
        cl_j = jnp.asarray(np.concatenate([cl_all, np.zeros(pad, np.int32)]))
        w_j = jnp.asarray(np.concatenate([w_all, np.zeros(pad, np.float32)]))
        n_cl = _bucket(max(len(kf_row), 1), lo=4)
        mean_t, cov_t = color_ops.cluster_stats(tex_j, w_j, cl_j, n_cl)
        mean_v, cov_v = color_ops.cluster_stats(vox_j, w_j, cl_j, n_cl)
        t_mats = color_ops.transfer_matrices(mean_t, cov_t, mean_v, cov_v)
        corrected = color_ops.apply_transfer(tex_j, cl_j, t_mats,
                                             mean_t, mean_v)
        deltas, t_np, mt_np, mv_np = jax.device_get(
            (corrected - tex_j, t_mats, mean_t, mean_v))
        pos = 0
        for slot, n_verts in owners:
            self.chunk_tex[slot].color_adjust = deltas[pos:pos + n_verts]
            pos += n_verts
        # keep per-keyframe transfers for baking into the atlas at export
        self._kf_transfer = {
            kf: (t_np[row], mt_np[row], mv_np[row])
            for kf, row in kf_row.items()
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
