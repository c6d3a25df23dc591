"""Background device→host fetch helper.

On the tunneled TPU backend every blocking fetch costs a ~20 ms link RTT
*plus* time queued behind previously dispatched device work, and
`copy_to_host_async` is best-effort (a no-op on backends that don't
support it). `fetch_async` instead hands the fetch to a dedicated thread:
`jax.device_get` blocks there with the GIL released, so the RTT and the
transfer overlap with the caller's host work. Consumers resolve the
Future when they actually need the bytes — typically a whole fusion
cycle later, by which point the result is already sitting in host memory.

(The reference reads everything from CPU RAM for free — Threading.h
parallel_for world; this helper is what makes the same host-side
orchestration latency-tolerant on a remote accelerator.)
"""

from __future__ import annotations

import concurrent.futures
from typing import Any

import jax

_EXECUTOR = concurrent.futures.ThreadPoolExecutor(
    max_workers=2, thread_name_prefix="devfetch")


def fetch_async(tree: Any) -> "concurrent.futures.Future":
    """Start fetching a pytree of device arrays; returns a Future whose
    result() is the device_get'd host pytree."""
    try:
        for leaf in jax.tree.leaves(tree):
            copy = getattr(leaf, "copy_to_host_async", None)
            if copy is not None:
                copy()
    except Exception:
        pass
    return _EXECUTOR.submit(jax.device_get, tree)


def resolve(maybe_future: Any) -> Any:
    """Future → result; anything else → device_get (sync fallback)."""
    if hasattr(maybe_future, "result"):
        return maybe_future.result()
    return jax.device_get(maybe_future)
