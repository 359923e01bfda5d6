"""Bounded DataFrame caching for shared builder frames.

Several operators persist an intermediate frame that multiple branches
of the SAME query consume (MinHash band signatures, shingle posting
lists, tf-idf weights).  A bare ``df.persist()`` at the builder leaks:
registry queries hand their DataFrames to the driver, so no consumer
can pair an ``unpersist()`` with materialization, and every invocation
strands another cached frame for the session lifetime (observed across
the 175-query correctness sweep).

``cache_slot(key, df)`` keeps AT MOST ONE live cached frame per key:
the next invocation under the same key unpersists the previous
occupant before persisting the new frame.  Unpersisting a frame a
still-referenced plan uses is safe — Spark just recomputes it — so the
slot turnover can never corrupt an earlier query, only uncache it.
Frames persist MEMORY_AND_DISK so an oversized frame spills instead of
evicting executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_slots: dict[str, DataFrame] = {}


def cache_slot(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` under ``key``, evicting the key's previous frame."""
    old = _slots.pop(key, None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down / frame already gone
    _slots[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
    return _slots[key]


def release_slot(key: str) -> None:
    """Explicitly unpersist and drop a slot (streaming callers that can
    pair persist/unpersist per micro-batch)."""
    old = _slots.pop(key, None)
    if old is not None:
        old.unpersist(blocking=False)


def checkpoint_slot(key: str, df: DataFrame) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``df`` and keep at most one live
    checkpointed frame per key (same slot discipline as cache_slot).

    Use instead of cache_slot when the frame feeds MANY consumers in
    one plan (self-joins, band joins, re-expansion joins): a persisted
    frame still inlines its FULL logical lineage at every reference, so
    Catalyst re-analyzes/re-optimizes the subtree once per consumer —
    measured at 1.5-2.5 s of pure driver time on the banded-dedup
    family (optimization guide §3.3: "Materialising an intermediate
    result ... or localCheckpoint truncates the plan").  The eager
    checkpoint runs the subtree ONCE at build time and every consumer
    references a LogicalRDD leaf.

    Trade-offs vs cache_slot (why this is not the default): the build
    is eager (no lazy composition), the checkpointed blocks are
    non-replicated executor state (a lost executor at cluster scale
    forces a recompute-from-source restart of the query — acceptable
    for intra-query intermediates, same failure domain as shuffle
    files), and the frame can no longer fuse with downstream projections.
    Blocks are freed when the previous occupant is dropped (explicit
    unpersist + ContextCleaner on GC)."""
    old = _slots.pop(key, None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    # a direct (non-reuse) turnover invalidates any reuse lineage
    # recorded under this key, or the next checkpoint_slot_reuse call
    # could match the stale lineage and serve the wrong occupant
    _reuse_orig.pop(key, None)
    _slots[key] = df.localCheckpoint(eager=True)
    return _slots[key]


# original (pre-checkpoint) frame per reuse key, for sameSemantics
# comparison — a checkpointed frame is a LogicalRDD leaf, so the
# incoming lineage must be compared against the lineage that BUILT the
# occupant, not the occupant itself
_reuse_orig: dict[str, DataFrame] = {}


def checkpoint_slot_reuse(key: str, df: DataFrame) -> DataFrame:
    """checkpoint_slot with cache_slot_reuse's occupancy rule: when the
    incoming frame is semantically identical to the one that built the
    current occupant, return the occupant (two operators sharing a
    builder over the same input share one materialization per session);
    a different lineage evicts and re-checkpoints."""
    orig = _reuse_orig.get(key)
    cur = _slots.get(key)
    if orig is not None and cur is not None:
        try:
            if df.sameSemantics(orig):
                return cur
        except Exception:
            pass  # can't compare -> fall through to turnover
    out = checkpoint_slot(key, df)  # clears _reuse_orig[key]; re-record
    _reuse_orig[key] = df
    return out


def cache_slot_reuse(key: str, df: DataFrame) -> DataFrame:
    """Like cache_slot, but REUSES the occupant when the incoming frame
    is semantically identical (same analyzed-plan semanticHash) — so
    two operators sharing a builder over the same input (ngram_jaccard
    + ngram_containment's posting list) share one materialization per
    session instead of evicting each other.  A different lineage still
    evicts, keeping the one-live-frame bound."""
    old = _slots.get(key)
    if old is not None:
        try:
            # sameSemantics compares CANONICALIZED plans exactly —
            # semanticHash() alone is a 32-bit hash whose collision
            # would silently serve a stale frame to a certified op
            if df.sameSemantics(old):
                return old
        except Exception:
            pass  # can't compare -> fall through to turnover
    return cache_slot(key, df)
