"""Pins the bench harness's row-order-independence mechanism.

Round-6 history: a 2x regression on `ivf_pq_ann` appeared only when a
new eagerly-checkpointing row joined the suite — `clearCache()` between
rows drops cached relations but NOT `localCheckpoint` RDD blocks, so
checkpoint blocks accumulated and pressured later memory-hungry rows.
This test pins both halves of the fix: the Spark behavior the harness
works around, and `_release_row_state` actually freeing everything.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_clearcache_leaves_checkpoints_and_release_frees_them(spark):
    import bench

    df = spark.range(1000).localCheckpoint(eager=True)
    assert df.count() == 1000
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() >= 1

    # the round-6 trap: clearCache() is NOT enough for checkpoint blocks
    spark.catalog.clearCache()
    assert jsc.getPersistentRDDs().size() >= 1

    residue, remaining = bench._release_row_state(spark)
    assert residue >= 1  # the checkpoint footprint is attributed...
    assert remaining == 0  # ...and force-unpersist freed it
    assert jsc.getPersistentRDDs().size() == 0


def test_release_row_state_also_clears_cached_relations(spark):
    import bench

    df = spark.range(500).cache()
    df.count()
    residue, remaining = bench._release_row_state(spark)
    # cached relations are dropped by clearCache BEFORE the residue
    # count — they are expected row state, not checkpoint residue
    assert (residue, remaining) == (0, 0)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    # the frame stays usable — persist-only handles recompute
    assert df.count() == 500
