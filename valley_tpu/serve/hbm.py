"""Serving-wide HBM budget: one accountant for everything a worker keeps
resident on the chip.

Before this module each KV-bearing cache had its own LRU cap (pool rows,
``--max-sessions``, ``--prefix-cache``) and nothing bounded the SUM — a
mis-set ``--max-sessions x --prefix-cache x --max-batch`` combination
OOMed at runtime instead of being rejected or degraded.  Now:

- FIXED allocations (engine weights, the continuous-batching pool
  including its parked-ready worst case) are registered at startup and
  an over-budget config raises immediately (config rejection, not a
  mid-traffic OOM);
- DYNAMIC allocations (per-session KV caches, prefix-cache fragments)
  reserve before allocating; when the budget is short the worker evicts
  across caches (prefix fragments first — pure optimization — then idle
  sessions) and, failing that, degrades: prefix caching is skipped (the
  request runs the plain uncached path) and new sessions are refused
  with a clear error instead of OOMing the chip.

Byte accounting is exact, derived from the same shape math the
allocators use (``llama.init_cache`` KV layout; int8 caches carry bf16
scale planes).  With a TP mesh, arrays are sharded over ``mesh.size``
chips, so per-chip bytes divide accordingly.

Reference equivalent: the hardcoded "13GiB" per-GPU cap at
/root/reference/valley/serve/model_worker.py:57 — a single coarse knob
on one cache; here the budget governs every resident byte.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

GiB = 1 << 30


class BudgetExceeded(RuntimeError):
    """A FIXED registration (weights / pool) doesn't fit the budget —
    raised at startup so the config is rejected before serving traffic."""


def tree_bytes(tree) -> int:
    """Total bytes of every array leaf in a pytree (global bytes for
    sharded arrays — divide by mesh size for per-chip)."""
    return sum(x.nbytes for x in jax.tree.leaves(tree)
               if hasattr(x, "nbytes"))


def kv_slot_bytes(text_cfg, cache_dtype) -> int:
    """Bytes one (row, slot) occupies in a KV cache: K+V planes across
    all layers, plus the two bf16 scale planes for int8 caches
    (mirrors ``llama.init_cache``)."""
    itemsize = jnp.dtype(cache_dtype).itemsize
    per = (2 * text_cfg.kv_heads * text_cfg.head_dim * itemsize)
    if jnp.dtype(cache_dtype) == jnp.int8:
        per += 2 * text_cfg.kv_heads * 2   # bf16 scales, K and V
    return per * text_cfg.num_hidden_layers


def session_cache_bytes(engine, extra_slots: Optional[int],
                        decode_slack: int, bucket: Optional[int] = None
                        ) -> int:
    """Worst-case resident bytes of one ChatSession's KV cache (the
    session sizes its cache at first turn: bucket + max_new + extra +
    slack slots; without a known first-chunk length, assume the largest
    bucket)."""
    eng = engine
    extra = extra_slots if extra_slots is not None \
        else 4 * (eng.max_new_tokens + 64)
    b = bucket if bucket is not None else eng.buckets[-1]
    cache_len = b + eng.max_new_tokens + extra + decode_slack
    return cache_len * kv_slot_bytes(eng.cfg.text, eng.cache_dtype)


def prefix_fragment_bytes(engine, prefix_len: int) -> int:
    """Resident bytes of one PrefixCache entry (only the bucket-slot
    fragment is stored; see PrefixCache.__init__)."""
    bucket = engine.pick_bucket(prefix_len)
    return bucket * kv_slot_bytes(engine.cfg.text, engine.cache_dtype)


def device_hbm_bytes() -> Optional[int]:
    """The accelerator's reported HBM capacity, or None when the backend
    doesn't expose it (CPU test meshes)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or None


class HbmBudget:
    """Thread-safe byte ledger.  ``register_fixed`` is for startup-time
    allocations and raises when over budget; ``reserve``/``release`` are
    for dynamic entries and never raise — a failed reserve returns False
    and the caller degrades."""

    def __init__(self, total_bytes: int):
        self.total = int(total_bytes)
        self._lock = threading.Lock()
        self._fixed: Dict[str, int] = {}
        self._dyn: Dict[str, Tuple[str, int]] = {}   # key -> (kind, bytes)

    # -- introspection ---------------------------------------------------

    def used(self) -> int:
        with self._lock:
            return self._used_locked()

    def free(self) -> int:
        with self._lock:
            return self.total - self._used_locked()

    def _used_locked(self) -> int:
        return (sum(self._fixed.values())
                + sum(b for _, b in self._dyn.values()))

    def snapshot(self) -> dict:
        """Status-endpoint payload: budget / used / per-kind breakdown."""
        with self._lock:
            by: Dict[str, int] = dict(self._fixed)
            for kind, b in self._dyn.values():
                by[kind] = by.get(kind, 0) + b
            used = self._used_locked()
        return {"budget_bytes": self.total, "used_bytes": used,
                "free_bytes": self.total - used,
                "by": {k: v for k, v in sorted(by.items())}}

    # -- fixed (startup) -------------------------------------------------

    def register_fixed(self, name: str, nbytes: int) -> None:
        with self._lock:
            self._fixed[name] = int(nbytes)
            used = self._used_locked()
            if used > self.total:
                detail = ", ".join(f"{k}={v / GiB:.2f}GiB"
                                   for k, v in self._fixed.items())
                raise BudgetExceeded(
                    f"fixed HBM allocations ({detail}) total "
                    f"{used / GiB:.2f} GiB > budget "
                    f"{self.total / GiB:.2f} GiB — reduce --max-batch / "
                    f"engine max_new_tokens, or raise --hbm-budget")

    # -- dynamic (sessions / prefix fragments) -----------------------------

    def reserve(self, key: str, kind: str, nbytes: int,
                make_room: Optional[Callable[[int], int]] = None) -> bool:
        """Reserve ``nbytes`` under ``key``.  When short, ``make_room``
        (called WITHOUT the ledger lock — it may evict caches that
        release entries here) is asked for the deficit; one retry after
        each productive eviction round, bounded to the number of
        evictable entries."""
        nbytes = int(nbytes)
        for _ in range(64):   # bound: each round must free something
            with self._lock:
                free = self.total - self._used_locked()
                if key in self._dyn:
                    free += self._dyn[key][1]   # re-reserve replaces
                if nbytes <= free:
                    self._dyn[key] = (kind, nbytes)
                    return True
                deficit = nbytes - free
            if make_room is None or make_room(deficit) <= 0:
                return False
        return False

    def update(self, key: str, nbytes: int) -> None:
        """Correct an estimate to the exact allocated size (no-op for
        unknown keys — the entry may have been released concurrently)."""
        with self._lock:
            if key in self._dyn:
                self._dyn[key] = (self._dyn[key][0], int(nbytes))

    def release(self, key: str) -> int:
        with self._lock:
            _, b = self._dyn.pop(key, (None, 0))
            return b
