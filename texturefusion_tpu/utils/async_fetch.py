"""Background device→host fetch helper.

On the tunneled TPU backend every *fresh* fetch costs a ~22 ms link RTT
(measured; latency, not bandwidth — parallel fetches overlap perfectly),
while `copy_to_host_async` genuinely lands the bytes in the host-side
cache so a later `device_get` of the same array returns in ~0.1 ms.

`fetch_async` therefore just starts the async copies and hands back a
lightweight handle; `result()`/`resolve()` run `jax.device_get` on the
CALLER's thread — free when the copy landed, and blocking exactly as
long as the producing program + one RTT when it has not. Earlier
revisions funneled every fetch through a tiny shared ThreadPoolExecutor;
a fresh fetch then head-of-line blocked every queued consumer behind its
22 ms RTT (the round-3 consume_gc=122 ms / t_stats_sync=32 ms stalls
were exactly this), so the executor is gone.

(The reference reads everything from CPU RAM for free — Threading.h
parallel_for world; this helper is what makes the same host-side
orchestration latency-tolerant on a remote accelerator.)
"""

from __future__ import annotations

import threading
from typing import Any

import jax


class DeviceFetch:
    """Handle for an in-flight device→host copy of a pytree.

    background=True (the DEFAULT) is load-bearing on the tunneled
    backend: `is_ready()` there only flips after a link RTT — and can
    lag UNBOUNDEDLY when nothing else drives the tunnel's event loop
    (measured 108 s once) — so every done()-gated consumer (ready-only
    flushes, pipeline riding, grace windows) mis-saw fetches as pending
    forever. A waiter thread's device_get gets the bytes ~1 RTT after
    compute, reliably.

    defer=True queues the fetch in the module-level TRANSFER WINDOW
    instead of starting it: on the tunneled backend EVERY host↔device
    transfer issuance stalls the device stream for one ~23 ms RTT, but
    CONCURRENT transfers share a single stall (measured: 1 fetch ≈
    23 ms of stream stall, 10 co-issued ≈ 26 ms). flush_fetches() —
    called once per frame from the tracking dispatch — launches every
    queued copy in one burst so the whole frame's fetch traffic costs
    one shared stall instead of one stall per call site. result() on an
    unflushed handle self-flushes, so correctness never depends on the
    flush cadence."""

    __slots__ = ("tree", "_event", "_result", "_launched", "t_created",
                 "t_started", "t_landed")

    def __init__(self, tree: Any, background: bool = True,
                 defer: bool = False):
        self.tree = tree
        self._event = threading.Event() if (background or defer) else None
        self._result = None
        self._launched = False
        import time as _time
        self.t_created = _time.perf_counter()
        self.t_started = None
        self.t_landed = None
        if defer:
            with _WINDOW_LOCK:
                _WINDOW.append(self)
            return
        self._launch(background)

    def _launch(self, background: bool = True) -> None:
        if self._launched:
            return
        self._launched = True
        try:
            for leaf in jax.tree.leaves(self.tree):
                copy = getattr(leaf, "copy_to_host_async", None)
                if copy is not None:
                    copy()
        except Exception:
            pass  # backends without async copies fall back to plain get
        if self._event is not None:
            # a waiter thread device_gets into the handle, so done()
            # means LANDED (is_ready only means computed — the host copy
            # of a large payload arrives up to one RTT + transfer later,
            # and a consumer polling is_ready can still stall ~60 ms on
            # resolve). One short-lived thread per fetch: no shared
            # queue, so a slow fetch can never head-of-line block
            # another (the round-3 executor regression).
            t = threading.Thread(target=self._bg_fetch, daemon=True)
            t.start()

    def _bg_fetch(self) -> None:
        import time as _time
        self.t_started = _time.perf_counter()
        try:
            self._result = jax.device_get(self.tree)
        finally:
            self.t_landed = _time.perf_counter()
            self._event.set()

    def result(self) -> Any:
        if self._event is not None:
            if not self._launched:
                # self-flush: launch the whole pending window so the
                # stall is still shared with any co-queued fetches
                flush_fetches()
            self._event.wait()
            return self._result
        return jax.device_get(self.tree)

    def done(self) -> bool:
        """True when the value is available cheaply: background fetches
        report the host copy LANDED; plain fetches report every leaf
        computed (the copy is then landed or at most one link RTT away).
        Consumers that can tolerate one more cycle of staleness use this
        to skip resolving fetches that would stall. Deferred fetches
        report not-done until flushed AND landed (the per-frame flush
        bounds the wait to one frame)."""
        if self._event is not None:
            return self._event.is_set()
        try:
            return all(leaf.is_ready() if hasattr(leaf, "is_ready") else True
                       for leaf in jax.tree.leaves(self.tree))
        except Exception:
            return True


_WINDOW: list = []
_WINDOW_LOCK = threading.Lock()


def flush_fetches() -> int:
    """Launch every deferred fetch as ONE combined device_get in ONE
    waiter thread. The tunnel client serializes operations behind each
    in-flight get for its full ~22 ms RTT (measured: a loop doing one
    small get per frame floors at ~21 ms/frame regardless of payload),
    so N separate gets cost ~N RTTs of client serialization while one
    combined get costs one. Called once per frame from the tracking
    loop; any thread may call it (result() self-flushes). A handle is
    marked launched under the lock, so a concurrent result() between
    flush and thread start just waits on the event."""
    with _WINDOW_LOCK:
        batch, _WINDOW[:] = _WINDOW[:], []
        for f in batch:
            f._launched = True
    if not batch:
        return 0
    try:
        for f in batch:
            for leaf in jax.tree.leaves(f.tree):
                copy = getattr(leaf, "copy_to_host_async", None)
                if copy is not None:
                    copy()
    except Exception:
        pass

    def _get_all():
        import time as _time
        t0 = _time.perf_counter()
        try:
            results = jax.device_get([f.tree for f in batch])
        except Exception:
            results = None
        t1 = _time.perf_counter()
        for i, f in enumerate(batch):
            f.t_started = t0
            if results is not None:
                f._result = results[i]
            else:
                # combined get failed: fall back per-handle
                try:
                    f._result = jax.device_get(f.tree)
                except Exception:
                    f._result = None
            f.t_landed = t1
            f._event.set()

    threading.Thread(target=_get_all, daemon=True).start()
    return len(batch)


def fetch_async(tree: Any, background: bool = True,
                defer: bool = False) -> DeviceFetch:
    """Start (or, with defer=True, queue into the per-frame transfer
    window) the device→host copies for a pytree; returns a handle whose
    result() is the device_get'd host pytree (near-free once landed).
    A waiter thread makes done() mean LANDED (see DeviceFetch)."""
    return DeviceFetch(tree, background=background, defer=defer)


def resolve(maybe_future: Any) -> Any:
    """Fetch handle → result; anything else → device_get (sync fallback)."""
    if hasattr(maybe_future, "result"):
        return maybe_future.result()
    return jax.device_get(maybe_future)
