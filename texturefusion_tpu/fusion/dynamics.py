"""Re-integration scheduling from pose drift.

Re-design of the reference's map-dynamics logic
(ref: GCFusion/MobileFusion.cpp:13-67 GetMapDynamics;
GCFusion/MapMaintain.hpp:239-258 GetPoseDifference and :175-238
SelectLargestNValues): keyframes whose current BA pose drifted from the
pose they were last integrated at are de-integrated and re-integrated.
Selection uses moving-average windows over the per-keyframe drift costs,
picking the segments with the largest accumulated drift.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.core import se3

DRIFT_THRESHOLD = 1e-4   # ref: MapMaintain.hpp threshold on window cost


def pose_drift_costs(current: np.ndarray, integrated: np.ndarray) -> np.ndarray:
    """Weighted SE3 delta cost per keyframe [K]
    (ref: GetPoseDifference MapMaintain.hpp:239-258)."""
    if len(current) == 0:
        return np.zeros(0, np.float32)
    d = se3.pose_distance(jnp.asarray(current), jnp.asarray(integrated),
                          rot_weight=2.0, trans_weight=1.0)
    return np.asarray(d)


def select_keyframes_to_update(costs: np.ndarray, max_updates: int = 4,
                               window: int = 3,
                               threshold: float = DRIFT_THRESHOLD) -> List[int]:
    """Moving-average window selection (ref: SelectLargestNValues
    MapMaintain.hpp:175-238): smooth the drift costs with a centered
    window, then greedily take the highest-cost keyframes above threshold,
    suppressing immediate neighbors so updates spread across the map."""
    k = len(costs)
    if k == 0:
        return []
    smoothed = np.copy(costs).astype(np.float64)
    if k >= window > 1:
        # ('same' mode returns len(kernel) when the signal is shorter —
        # hence the k >= window guard)
        kernel = np.ones(window) / window
        smoothed = np.convolve(costs, kernel, mode="same")
    order = np.argsort(-smoothed)
    picked: List[int] = []
    suppressed = np.zeros(k, bool)
    for i in order:
        if len(picked) >= max_updates:
            break
        if suppressed[i] or smoothed[i] <= threshold:
            continue
        picked.append(int(i))
        lo = max(0, i - 1)
        hi = min(k, i + 2)
        suppressed[lo:hi] = True
    return picked
