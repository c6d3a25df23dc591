"""MRF view selection: per-chunk keyframe labeling as a jitted ICM solver.

TPU-native replacement for the vendored mapmap MAP solver + TexMap driver
(ref: Structure/TexMap.cpp:120-255 view_selection — graph :122-137, label
sets :139-155, unaries 1 − q/colmax :157-180, PairwisePotts(pairwise_cost)
with edge weight adjacent_cost, warm start from labelstorage :200-225,
label 0 = undefined with second-newest-keyframe fallback :228-246;
3rd_party/mapmap/ ~17 kLoC).

SURVEY.md §2 #26: the problem is Potts-pairwise with tiny per-node label
sets (the keyframes observing each chunk, ≤ max_labels), over the
6-neighbor chunk grid — a graph that is 2-colorable by the parity of
chunk coordinates. Parallel ICM with checkerboard (red/black) sweeps is
therefore exact coordinate descent, converges in a few sweeps at this
size, and runs as one fixed-point tensor program over
[nodes, max_labels] costs — no tree sampling, no TBB.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MRFProblem(NamedTuple):
    unary: jnp.ndarray        # [N, L] unary costs (1e9 for absent labels)
    label_kf: jnp.ndarray     # [N, L] int32 keyframe id per label slot (-1 absent)
    neighbors: jnp.ndarray    # [N, 6] int32 node index (N = self-loop padding)
    parity: jnp.ndarray       # [N] int32 0/1 — checkerboard color
    init_label: jnp.ndarray   # [N] int32 initial label slot (warm start)
    n_valid: jnp.ndarray      # [N] bool — node participates


@functools.partial(jax.jit, static_argnames=("sweeps",))
def solve_icm(problem: MRFProblem, potts_weight: float, edge_weight: float,
              sweeps: int = 12) -> jnp.ndarray:
    """Checkerboard ICM fixed point. Returns [N] label slot per node."""
    n, l = problem.unary.shape
    # neighbor padding: index n → a virtual node with label -2 (never equal)
    label_kf_pad = jnp.concatenate(
        [problem.label_kf, jnp.full((1, l), -2, jnp.int32)], axis=0)

    def node_costs(labels):
        """[N, L] total cost of assigning each label slot, given labels."""
        lab_pad = jnp.concatenate([labels, jnp.zeros(1, jnp.int32)])
        nbr_kf = jnp.take_along_axis(
            label_kf_pad[problem.neighbors],                     # [N, 6, L]
            lab_pad[problem.neighbors][..., None], axis=-1)[..., 0]  # [N, 6]
        # Potts: pay when our keyframe id differs from the neighbor's
        diff = problem.label_kf[:, None, :] != nbr_kf[:, :, None]  # [N, 6, L]
        nbr_real = (problem.neighbors < n)[..., None]
        pair = jnp.sum(jnp.where(nbr_real, diff, False).astype(jnp.float32),
                       axis=1) * (potts_weight * edge_weight)
        return problem.unary + pair

    def sweep(i, labels):
        costs = node_costs(labels)
        best = jnp.argmin(costs, axis=-1).astype(jnp.int32)
        color = i % 2
        upd = (problem.parity == color) & problem.n_valid
        return jnp.where(upd, best, labels)

    return jax.lax.fori_loop(0, sweeps * 2, sweep, problem.init_label)


def mrf_energy(problem: MRFProblem, labels: jnp.ndarray,
               potts_weight: float, edge_weight: float) -> jnp.ndarray:
    """Total labeling energy (for tests: ICM must never increase it)."""
    n, l = problem.unary.shape
    u = jnp.take_along_axis(problem.unary, labels[:, None], axis=1)[:, 0]
    u = jnp.where(problem.n_valid, u, 0.0)
    my_kf = jnp.take_along_axis(problem.label_kf, labels[:, None], axis=1)[:, 0]
    kf_pad = jnp.concatenate([my_kf, jnp.asarray([-2], jnp.int32)])
    nbr_kf = kf_pad[problem.neighbors]                           # [N, 6]
    nbr_real = (problem.neighbors < n) & problem.n_valid[:, None]
    pair = jnp.sum((nbr_kf != my_kf[:, None]) & nbr_real) \
        * (potts_weight * edge_weight) * 0.5 * 2.0
    # each undirected edge counted twice in the neighbor lists → ×0.5·2 = 1
    return jnp.sum(u) + pair * 0.5


class ViewSelector:
    """Host driver: builds MRF problems from the chunk graph + observation
    table and keeps warm-start labels (ref: TexMap labelstorage)."""

    def __init__(self, max_labels: int = 16, potts_weight: float = 1.0,
                 edge_weight: float = 0.5, sweeps: int = 12):
        self.max_labels = max_labels
        self.potts = potts_weight
        self.edge_w = edge_weight
        self.sweeps = sweeps
        self.labels: dict = {}     # slot -> chosen keyframe id (persistent)

    def build_problem(self, observations: dict, adjacency: dict,
                      chunk_ids: np.ndarray, newest_kf: int):
        """Host-side MRF assembly shared by select() and the fused
        texture-cycle program. Returns (problem, slots, label_kf_np)."""
        slots = sorted(adjacency.keys())
        if not slots:
            return None, [], None
        # pad node count to a bucket so the jitted solver compiles once
        # per size class, not per call
        n_real = len(slots)
        n = 64
        while n < n_real:
            n *= 2
        row_of = {s: i for i, s in enumerate(slots)}
        l = self.max_labels

        unary = np.full((n, l), 1e9, np.float32)
        label_kf = np.full((n, l), -1, np.int32)
        nbrs = np.full((n, 6), n, np.int32)
        parity = np.zeros(n, np.int32)
        init = np.zeros(n, np.int32)
        valid = np.zeros(n, bool)

        fallback_kf = max(newest_kf - 1, 0)
        for i, s in enumerate(slots):
            obs = observations.get(s, {})
            pos = [(kf, q) for kf, q in obs.items() if q > 0]
            pos.sort(key=lambda kq: -kq[1])
            pos = pos[:l]
            cid = chunk_ids[s]
            parity[i] = int(cid.sum()) & 1
            if not pos:
                label_kf[i, 0] = self.labels.get(s, fallback_kf)
                unary[i, 0] = 1.0
                init[i] = 0
                continue
            valid[i] = True
            qmax = max(q for _, q in pos)
            for j, (kf, q) in enumerate(pos):
                unary[i, j] = 1.0 - q / qmax
                label_kf[i, j] = kf
            # warm start: previous label if still in the set
            prev = self.labels.get(s)
            init[i] = 0
            if prev is not None:
                for j, (kf, _) in enumerate(pos):
                    if kf == prev:
                        init[i] = j
                        break
            for k, a in enumerate(adjacency[s][:6]):
                nbrs[i, k] = row_of.get(int(a), n)

        problem = MRFProblem(
            unary=jnp.asarray(unary), label_kf=jnp.asarray(label_kf),
            neighbors=jnp.asarray(nbrs), parity=jnp.asarray(parity),
            init_label=jnp.asarray(init), n_valid=jnp.asarray(valid))
        return problem, slots, label_kf

    def adopt_solution(self, slots, label_kf: np.ndarray,
                       sol: np.ndarray, newest_kf: int) -> dict:
        """Convert solved label slots to keyframe ids + persist warm
        start (ref: TexMap labelstorage + label-0 fallback)."""
        fallback_kf = max(newest_kf - 1, 0)
        out = {}
        for i, s in enumerate(slots):
            kf = int(label_kf[i, sol[i]])
            if kf < 0:
                kf = self.labels.get(s, fallback_kf)
            out[s] = kf
            self.labels[s] = kf
        return out

    def select(self, observations: dict, adjacency: dict, chunk_ids: np.ndarray,
               newest_kf: int) -> dict:
        """observations: slot → {kf: quality}; adjacency: slot → np[slots];
        chunk_ids: [capacity, 3] integer chunk coords (for parity).
        Returns slot → keyframe id. Chunks with no positive-quality
        observation fall back to the second-newest keyframe
        (ref: TexMap.cpp:228-246 label-0 handling)."""
        problem, slots, label_kf = self.build_problem(
            observations, adjacency, chunk_ids, newest_kf)
        if problem is None:
            return {}
        sol = np.asarray(solve_icm(problem, self.potts, self.edge_w,
                                   self.sweeps))
        return self.adopt_solution(slots, label_kf, sol, newest_kf)
