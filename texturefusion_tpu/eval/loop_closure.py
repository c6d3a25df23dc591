"""Loop-closure detection evaluation: precision / recall vs ground truth.

Python replacement for the reference's MATLAB harness
(ref: Tools/evaluation.m:30-50 — compares detected loop-closure flags
against a ground-truth co-visibility matrix).

Ground truth here is derived from poses: keyframes i, j (non-adjacent)
are a true loop pair when their ground-truth poses are within
(trans_thresh, rot_thresh) — i.e. they observe overlapping space.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def ground_truth_pairs(gt_poses: np.ndarray, trans_thresh: float = 1.0,
                       rot_thresh: float = 0.8,
                       min_separation: int = 2) -> set:
    """All (i, j) i<j keyframe pairs that truly overlap."""
    import jax.numpy as jnp

    from texturefusion_tpu.core import se3

    n = len(gt_poses)
    out = set()
    for i in range(n):
        for j in range(i + min_separation, n):
            delta = np.asarray(se3.se3_log(se3.compose(
                se3.inverse(jnp.asarray(gt_poses[i])), jnp.asarray(gt_poses[j]))))
            if (np.linalg.norm(delta[:3]) < trans_thresh
                    and np.linalg.norm(delta[3:]) < rot_thresh):
                out.add((i, j))
    return out


def precision_recall(detected: Sequence[Tuple[int, int]],
                     truth: set) -> Dict[str, float]:
    """Precision/recall of detected loop pairs (order-normalized)."""
    det = {(min(a, b), max(a, b)) for a, b in detected}
    if not det:
        return {"precision": 1.0 if not truth else 0.0,
                "recall": 0.0 if truth else 1.0,
                "tp": 0, "fp": 0, "fn": len(truth)}
    tp = len(det & truth)
    fp = len(det - truth)
    fn = len(truth - det)
    return {
        "precision": tp / max(tp + fp, 1),
        "recall": tp / max(tp + fn, 1),
        "tp": tp, "fp": fp, "fn": fn,
    }


def detected_pairs_from_slam(slam) -> List[Tuple[int, int]]:
    """Non-adjacent registered keyframe pairs = detected loop closures."""
    ki = np.asarray(slam.edges.kf_i)[: slam.n_edges]
    kj = np.asarray(slam.edges.kf_j)[: slam.n_edges]
    valid = np.asarray(slam.edges.valid)[: slam.n_edges]
    out = []
    for i, j, v in zip(ki.tolist(), kj.tolist(), valid.tolist()):
        if v and abs(i - j) > 1:
            out.append((i, j))
    return out
