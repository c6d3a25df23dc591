"""Device-mesh helpers for multi-chip / multi-host scale-out.

The reference has no distributed backend at all (SURVEY.md §2.3 — its
entire concurrency model is two boost threads + parallel_for). This layer
is the new capability: TSDF chunk slots and BA edges are sharded over a
1-D device mesh; collectives ride ICI via psum/all_gather inserted by XLA
under shard_map/pjit.

Multi-host: call `init_distributed()` (jax.distributed.initialize) before
building meshes; the same code then spans hosts over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Sharding that splits an array's leading dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (jax.distributed). No-op in a single
    process when no coordinator is configured."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized
