import jax.numpy as jnp
import numpy as np
import pytest

from texturefusion_tpu.config import tiny_test_config
from texturefusion_tpu.core import camera as cam
from texturefusion_tpu.fusion.chunkmap import TSDFVolume
from texturefusion_tpu.fusion.mesher import IncrementalMesher
from texturefusion_tpu.io import synthetic
from texturefusion_tpu.ops import mc_tables, marching_cubes as mc


def test_tri_table_basic_invariants():
    assert mc_tables.TRI_TABLE.shape == (256, mc_tables.MAX_TRIS * 3)
    assert mc_tables.TRI_COUNTS[0] == 0 and mc_tables.TRI_COUNTS[255] == 0
    # single-corner cases: exactly 1 triangle
    for c in range(8):
        assert mc_tables.TRI_COUNTS[1 << c] == 1
    # NOTE: no complement symmetry assertion — the ambiguous-face rule
    # (cut off inside corners) intentionally resolves case/complement
    # differently; consistency across shared faces is what matters and is
    # covered by the watertightness tests below.


def test_tri_table_watertight_within_cube():
    # every interior segment (pair of edge-vertices) must appear exactly
    # twice among a case's triangles OR lie on a cube face
    for case in range(256):
        tris = mc_tables.TRI_TABLE[case]
        tris = tris[tris >= 0].reshape(-1, 3)
        seg_count = {}
        for t in tris:
            for i in range(3):
                seg = tuple(sorted((t[i], t[(i + 1) % 3])))
                seg_count[seg] = seg_count.get(seg, 0) + 1
        for (a, b), cnt in seg_count.items():
            assert cnt <= 2, (case, a, b, cnt)
            if cnt == 1:
                # boundary segment: both edge midpoints on a common face
                ma = mc_tables.CORNER_OFFSETS[mc_tables.EDGE_CORNERS[a]].mean(0)
                mb = mc_tables.CORNER_OFFSETS[mc_tables.EDGE_CORNERS[b]].mean(0)
                on_face = any(
                    (ma[d] == v and mb[d] == v) for d in range(3) for v in (0.0, 1.0))
                assert on_face, (case, a, b)


def _mesh_sphere(radius=0.5, res=0.05, center=(0.6, 0.6, 0.6)):
    """Fill a volume analytically with a sphere SDF and mesh it."""
    cfg = tiny_test_config()
    cfg = cfg.replace(tsdf=cfg.tsdf.__class__(voxel_resolution=res, capacity=512,
                                              max_update_chunks=256))
    vol = TSDFVolume(cfg)
    # allocate chunks covering the sphere
    extent = vol.extent
    r = int(np.ceil((radius + 3 * res) / extent)) + 1
    c0 = np.floor(np.asarray(center) / extent).astype(np.int32)
    ids = np.array([[x, y, z]
                    for x in range(c0[0] - r, c0[0] + r + 1)
                    for y in range(c0[1] - r, c0[1] + r + 1)
                    for z in range(c0[2] - r, c0[2] + r + 1)], np.int32)
    slots = vol.allocate(ids)
    from texturefusion_tpu.core import geometry
    cent = geometry.voxel_centroids(cfg.tsdf.chunk_size, res)
    origins = ids.astype(np.float32) * extent
    pts = origins[:, None, :] + cent[None]                      # [U, V, 3]
    sdf = np.linalg.norm(pts - np.asarray(center), axis=-1) - radius
    band = np.abs(sdf) < 5 * res
    w = band.astype(np.float32)
    sdf = np.where(band, sdf, 999.0).astype(np.float32)
    vol.batch = vol.batch._replace(
        sdf=vol.batch.sdf.at[jnp.asarray(slots)].set(jnp.asarray(sdf)),
        weight=vol.batch.weight.at[jnp.asarray(slots)].set(jnp.asarray(w)),
    )
    vol.dirty_mesh.update(slots.tolist())
    mesher = IncrementalMesher(vol)
    n = mesher.update_meshes()
    assert n == len(slots)
    return mesher.full_mesh(), center, radius


def test_sphere_mesh_geometry():
    (verts, faces, colors, normals), center, radius = _mesh_sphere()
    assert len(verts) > 200
    assert len(faces) > 200
    d = np.linalg.norm(verts - np.asarray(center), axis=-1)
    # vertices lie on the sphere within a voxel
    assert np.abs(d - radius).max() < 0.05, np.abs(d - radius).max()
    assert np.abs(d - radius).mean() < 0.01
    # normals point radially outward
    radial = (verts - np.asarray(center)) / d[:, None]
    cos = np.sum(radial * normals, axis=-1)
    assert cos.mean() > 0.97, cos.mean()
    assert (cos > 0.5).mean() > 0.99


def test_sphere_mesh_watertight_euler():
    (verts, faces, _, _), _, _ = _mesh_sphere()
    # merge duplicated boundary vertices, then check edge manifoldness
    key = np.round(verts / 1e-5).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    f = inv[faces]
    # drop degenerate faces created by merging
    good = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    f = f[good]
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    # closed surface: every edge shared by exactly 2 triangles
    frac2 = (counts == 2).mean()
    assert frac2 > 0.995, frac2
    # Euler characteristic of a sphere = 2
    v_n = len(np.unique(f.reshape(-1)))
    e_n = len(np.unique(edges, axis=0))
    f_n = len(f)
    assert v_n - e_n + f_n == 2, (v_n, e_n, f_n)


def test_fused_scene_mesh_on_walls():
    cfg = tiny_test_config()
    intr = cam.Intrinsics.from_config(cfg.camera)
    scene = synthetic.BoxRoomScene()
    poses = synthetic.orbit_trajectory(3)
    depths, rgbs = synthetic.render_sequence(scene, intr, poses)
    vol = TSDFVolume(cfg)
    for p, d, c in zip(poses, depths, rgbs):
        vol.integrate_frame(jnp.asarray(d), jnp.asarray(c),
                            jnp.zeros_like(jnp.asarray(d)), jnp.asarray(p),
                            keyframe_id=0)
    mesher = IncrementalMesher(vol)
    mesher.update_meshes()
    verts, faces, colors, normals = mesher.full_mesh()
    assert len(verts) > 500
    # every vertex should be near the analytic scene surface
    sdf_vals = np.abs(np.asarray(scene.sdf(jnp.asarray(verts))))
    assert np.median(sdf_vals) < cfg.tsdf.voxel_resolution, np.median(sdf_vals)
    assert sdf_vals.mean() < 2 * cfg.tsdf.voxel_resolution
    # colors should be populated (scene renders colored walls)
    assert colors.max() > 0.1
