"""Process-wide byte budget for driver-resident query caches.

A serving driver (gofias_spark.server) can host SEVERAL warmed engines —
one per index, plus a prefix index (FulltextAPI), plus rolling replacements
during ``_reopen``. Each ``SearchEngine.warm()`` may materialize the
small-segment searcher (``_local_blocks`` / ``_local_meta`` /
``_local_positions`` pandas frames, the tombstone array) and the term-stats
dict — all driver RSS. Individually each is bounded in ROWS
(``local_max_blocks``, ``max_terms``); this module adds the missing
PROCESS-level BYTE bound across engines, so N indexes on one gateway can't
silently multiply the per-engine budgets into an OOM.

Model: an admission-controlled LRU.

* ``admit(key, nbytes, evict_cb)`` — called by an engine after it has
  materialized (and measured) its resident caches. If the entry ALONE
  exceeds the budget, admission is refused (the caller drops what it
  built and serves from the disk/distributed tiers instead). Otherwise
  the entry is registered and least-recently-used OTHER entries are
  evicted (their ``evict_cb`` drops their frames) until the total fits.
* ``touch(key)`` — cheap LRU bump, called on the engine's query entry
  points, so the index actually serving traffic is the last to go.
* ``release(key)`` — engine closed; forget its accounting.

Eviction degrades, never breaks: an evicted engine's local-tier attributes
go back to ``None``, which is exactly the cold state its routing already
handles (serve-cache parquet scan, else the distributed doc_part path —
same results by construction). A query in flight on the evicted engine at
that instant may observe the drop mid-route and fail — the same benign
race class as ``FulltextAPI._reopen``'s swap-then-close, and like it,
bounded to the eviction instant on a multi-index driver.

The budget is ``None`` (unlimited — the single-index default) unless set
via :func:`set_cache_budget` or the ``GOFIAS_DRIVER_CACHE_BYTES`` env var
at import. Bytes are the measured pandas deep memory / numpy nbytes of
the registered frames — a deliberate proxy for RSS that tracks the caches
this module governs rather than the whole interpreter heap.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Callable


class CacheGovernor:
    def __init__(self, budget_bytes: int | None = None) -> None:
        self._lock = threading.RLock()
        self._budget = budget_bytes
        # key -> (nbytes, evict_cb); insertion order == LRU order
        self._entries: "OrderedDict[object, tuple[int, Callable]]" = (
            OrderedDict()
        )

    @property
    def budget_bytes(self) -> int | None:
        return self._budget

    def set_budget(self, budget_bytes: int | None) -> None:
        """Set (or clear) the shared byte budget and immediately evict
        down to it."""
        with self._lock:
            self._budget = budget_bytes
            self._shrink(keep=None)

    def total_bytes(self) -> int:
        with self._lock:
            return sum(n for n, _ in self._entries.values())

    def admit(
        self, key: object, nbytes: int, evict_cb: Callable[[], None]
    ) -> bool:
        """Register ``key`` holding ``nbytes`` of driver caches. Returns
        False (nothing registered) when the entry alone exceeds the
        budget; otherwise True, after evicting LRU peers to fit."""
        with self._lock:
            if self._budget is not None and nbytes > self._budget:
                self._entries.pop(key, None)
                return False
            self._entries.pop(key, None)
            self._entries[key] = (int(nbytes), evict_cb)
            self._shrink(keep=key)
            return True

    def touch(self, key: object) -> None:
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)

    def release(self, key: object) -> None:
        with self._lock:
            self._entries.pop(key, None)

    def keys(self) -> list:
        with self._lock:
            return list(self._entries)

    def _shrink(self, keep: object | None) -> None:
        if self._budget is None:
            return
        while (
            sum(n for n, _ in self._entries.values()) > self._budget
            and len(self._entries) > (1 if keep in self._entries else 0)
        ):
            for k in self._entries:  # oldest first
                if k != keep:
                    _, cb = self._entries.pop(k)
                    try:
                        cb()
                    except Exception:
                        pass
                    break


def _from_env() -> int | None:
    raw = os.environ.get("GOFIAS_DRIVER_CACHE_BYTES")
    if not raw:
        return None
    try:
        return int(raw)
    except ValueError:
        return None


GOVERNOR = CacheGovernor(_from_env())


def set_cache_budget(budget_bytes: int | None) -> None:
    """Set the process-wide driver-cache byte budget (None = unlimited)."""
    GOVERNOR.set_budget(budget_bytes)
