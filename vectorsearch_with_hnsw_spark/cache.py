"""Session-scoped cache tracking.

Operators in this package ``persist()`` intermediates that are read
more than once inside a single returned plan (self-join sides, per-band
branches, Lloyd training input) — Spark does not CSE across join sides
or union branches, so without the persist each reference re-executes
the subtree. Spark's CacheManager holds those relations until someone
unpersists them, which means a long-lived session that calls the
one-shot operators repeatedly accumulates cached relations without
bound (the bench harness compensated with a force-unpersist sweep, but
library callers and the test suite had no hook).

Every ``persist()`` the package creates therefore goes through
:func:`persist_tracked`, and :func:`release_caches` is the one cleanup
hook: it unpersists everything the package pinned, in registration
order. DataFrames previously returned by operators stay valid — a
plain persist recomputes from lineage on the next action.
``localCheckpoint`` handles are deliberately NOT tracked here: freeing
a checkpoint's blocks invalidates frames derived from it
(CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), so those stay owned by their
operator (all current checkpoint sites are consumed eagerly inside the
operator) and by harness-level sweeps at row boundaries.
"""
from __future__ import annotations

import threading
from typing import List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: List[DataFrame] = []


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register the handle for :func:`release_caches`."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LOCK:
        _TRACKED.append(out)
    return out


def release(df: DataFrame) -> None:
    """Unpersist one tracked handle now (operator done with it)."""
    untrack(df)
    df.unpersist()


def untrack(df: DataFrame) -> None:
    """Drop a handle from the registry (caller unpersisted it early)."""
    with _LOCK:
        for i, h in enumerate(_TRACKED):
            if h is df:
                del _TRACKED[i]
                break


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)


def release_checkpoint(df: DataFrame) -> None:
    """Free the RDD blocks behind a ``localCheckpoint``ed DataFrame.

    ``clearCache()`` does not reach checkpoint blocks (they live as
    persistent RDDs, not cached relations), so iterative operators that
    checkpoint per round (bpe_train's merge loop) would otherwise pin
    one block set per round for the life of the session — the
    accumulation VERDICT r12 #3 flagged. The checkpointed RDD is
    reachable through the analyzed plan's LogicalRDD node; unpersisting
    it drops the blocks whether or not they ever materialized (both
    verified on this Spark).

    DANGER: a freed checkpoint CANNOT recompute — any frame derived
    from ``df`` that has not itself materialized past it raises
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on next use. Only call when every
    consumer of ``df`` is fully materialized (or is itself a
    materialized checkpoint, whose lineage is already truncated)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(True)
    except Exception:
        # not a LogicalRDD-backed frame (already released, or never a
        # checkpoint) — freeing nothing is the correct outcome
        pass


def release_plan_checkpoints(df: DataFrame) -> int:
    """Free the blocks of EVERY ``localCheckpoint`` a result frame's
    plan depends on; returns how many checkpoint leaves were released.

    :func:`release_checkpoint` frees a checkpointed frame you hold the
    handle to; this walks the analyzed plan of any DERIVED frame (a
    persisted/projected result an iterative operator returned — e.g.
    ``knn_graph``'s stitched output) and unpersists each LogicalRDD
    leaf's RDD. Harness-side cleanup for results whose final round is
    necessarily checkpoint-backed: call it only when you are fully done
    with ``df`` and everything derived from it (same DANGER contract as
    :func:`release_checkpoint` — freed blocks cannot recompute)."""
    n = 0
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        it = leaves.iterator()
        while it.hasNext():
            node = it.next()
            if node.getClass().getSimpleName() == "LogicalRDD":
                node.rdd().unpersist(True)
                n += 1
    except Exception:
        pass
    return n


def release_caches() -> int:
    """Unpersist every intermediate the package pinned; returns how many
    handles were released. Safe to call at any operation boundary —
    previously returned DataFrames recompute from lineage."""
    with _LOCK:
        handles = list(_TRACKED)
        _TRACKED.clear()
    n = 0
    for df in handles:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
