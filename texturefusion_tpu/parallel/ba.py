"""Distributed FastBA: pose-graph GN with edge-sharded psum reduction.

The BASELINE.json north-star configuration: keyframes' pose graph
optimized across devices/hosts by sharding EDGES over the mesh — each
device reduces its edges' closed-form 6×6 Hessian blocks into the dense
system, a single psum combines them over ICI, and the (small) solve runs
replicated. The pre-integrated edge representation (slam/fastba.py, after
ref: MultiViewGeometry.cpp:720-834) makes the per-edge payload O(1), so
the reduction is tiny — exactly the property SURVEY.md §5 calls out.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from texturefusion_tpu.config import BAConfig
from texturefusion_tpu.core import se3
from texturefusion_tpu.slam import fastba
from texturefusion_tpu.slam.fastba import EdgeSums


def _local_system(poses, edges, n_kf):
    blocks = fastba._edge_blocks(poses, edges)
    return fastba.assemble_dense(*blocks, edges.kf_i, edges.kf_j, n_kf)


def distributed_gn(poses: jnp.ndarray, edges: EdgeSums, n_kf: int,
                   active: jnp.ndarray, cfg: BAConfig, mesh: Mesh,
                   axis: str = "shard"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Edge-sharded Gauss-Newton: same semantics as
    fastba.gauss_newton_rounds but with edges partitioned over `axis`.

    Edge arrays must have leading dim divisible by the mesh size (pad with
    valid=False). Returns (poses, err_before, err_after) — replicated.
    """
    n_dev = mesh.shape[axis]
    assert edges.s_w.shape[0] % n_dev == 0, "pad edges to mesh multiple"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(axis), edges), P()),
        out_specs=(P(), P(), P()),
    )
    def run(poses, edge_shard, active):
        def total_err(p):
            local = jnp.sum(fastba.edge_errors(p, edge_shard))
            return jax.lax.psum(local, axis)

        err0 = total_err(poses)

        def gn_iter(_, poses):
            h_loc, b_loc = _local_system(poses, edge_shard, n_kf)
            h = jax.lax.psum(h_loc, axis)
            b = jax.lax.psum(b_loc, axis)
            diag = jnp.arange(n_kf * 6)
            first_active = jnp.argmax(active)
            pin = (jnp.arange(n_kf) == first_active) | (~active)
            pin6 = jnp.repeat(pin, 6)
            h = h.at[diag, diag].add(jnp.where(pin6, 1e12, 0.0))
            h = h.at[diag, diag].add(cfg.levenberg_lambda
                                     + 1e-6 * jnp.abs(h[diag, diag]))
            dx = -jnp.linalg.solve(h, b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            xi = jnp.where(active[:, None], dx.reshape(n_kf, 6), 0.0)
            upd = se3.compose(se3.se3_exp(xi), poses)
            return jnp.where(active[:, None, None], upd, poses)

        new_poses = jax.lax.fori_loop(0, cfg.gn_iterations_per_round,
                                      gn_iter, poses)
        err1 = total_err(new_poses)
        grew = err1 > err0 * cfg.rollback_error_growth
        out = jnp.where(grew, poses, new_poses)
        return out, err0, jnp.where(grew, err0, err1)

    return run(poses, edges, active)


def pad_edges_for_mesh(edges: EdgeSums, n_dev: int) -> EdgeSums:
    """Pad edge arrays so the leading dim divides the mesh size."""
    e = edges.s_w.shape[0]
    target = ((e + n_dev - 1) // n_dev) * n_dev
    if target == e:
        return edges
    pad = target - e

    def pad_arr(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    return EdgeSums(*(pad_arr(a) for a in edges))


def shard_edges(edges: EdgeSums, mesh: Mesh, axis: str = "shard") -> EdgeSums:
    """Place edge arrays with their leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), edges)
