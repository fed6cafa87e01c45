"""Driver-session resilience: the driver invokes queries() with its OWN
SparkSession — no engine builder confs, possibly a non-UTC timezone and
explicit ANSI mode. load_table() pins the session contract at every
load; these tests prove representative oracle queries still match DuckDB
bit-for-bit from a deliberately hostile session state."""

from __future__ import annotations

import pytest

from tests.test_oracle_parity import _duck, _normalize
from vectorsearch_with_hnsw_spark.registry import REGISTRY

HOSTILE_QUERIES = [
    "events_tumbling",        # TIMESTAMP_LTZ windowing — tz-sensitive
    "events_sessionize",      # epoch arithmetic over timestamps
    "customer_order_gaps",    # date extraction + datediff
    "pricing_summary",        # decimal aggregation under ANSI
    "events_time_breakdown",  # calendar extraction — tz-sensitive
    "customer_trailing_revenue",  # RANGE frame over epoch-cast timestamps — DST-sensitive without the UTC pin
    "bm25_doc_rank",          # double score arithmetic under ANSI
    "kmeans_clusters",        # fixed-point means + float argmin under ANSI
    "pq_adc_ann",             # integer codes + LUT sums under ANSI
    "ivf_pq_ann",             # trained cells + residual codes + LUT sums under ANSI
    "dup_spans",              # window gaps-and-islands + big-int hashing under ANSI
    "lm_familiarity",         # left-join count sums under ANSI
    "funnel_steps",           # timestamp ordering + epoch casts — tz-sensitive
    "signup_cohorts",         # week truncation + datediff — tz-sensitive
    "zorder_events",          # epoch-day bit interleave — tz-sensitive
    "cms_token_counts",       # big-int row-salted hashing under ANSI
    "pq_refine_ann",          # ADC shortlist + exact L2 re-rank under ANSI
    "lsh_ann_cosine",         # banded sign-bit buckets + xor probes under ANSI
    "binary_refine_ann",      # bit-pack/popcount shortlist + cosine re-rank under ANSI
    "ivf_pq_filtered_ann",    # NEW r12: allowed-ids semi-join + residual ADC under ANSI
    "sq8_index_ann",          # NEW r12: artifact probe, integer codes under ANSI
    "maxsim_search",          # NEW r12 kernel: cosine folds + division under ANSI
    "knn_filtered_semijoin",  # cross-table semi-join + exact L2 under ANSI
    "ivf_pq_lifecycle_ann",   # NEW r12: frozen-state add + tombstone anti-join under ANSI
    "bpe_train",              # NEW r12: iterative merge loop, string folds under ANSI
    "hard_negatives",         # NEW r12: cosine band + margin float compare under ANSI
    "leakage_safe_split",     # NEW r12: components + salted modular hash under ANSI
    "decontaminate_fuzzy",    # NEW r12: minhash band buckets + semi-join under ANSI
    "bpe_train_incremental",  # NEW r13: maintained pair-count deltas under ANSI
    "bpe_encode",             # NEW r13: map-literal id lookup + integer fold checksum
    "bpe_vocab",              # NEW r13: freq-ranked vocab ids under ANSI
    "hard_negatives_shortlist",  # NEW r13: shortlist post-filter + label joins
    "dataset_split",          # r13 wrap-stable hash: reduced-mod multiply under ANSI
    "skipgram_pairs",         # NEW r13: element_at under ANSI — bounds-filtered lookups
    "strip_dup_spans",        # NEW r13: two-arg filter + exists token surgery under ANSI
    "dup_span_intervals",     # NEW r13: islands interval merge under ANSI
    "dedup_containment",      # NEW r13: least() int/int division under ANSI
    "lsh_recall_report",      # NEW r13: nested-CTE recall join under ANSI
    "multimodal_dup_pairs",   # NEW r13: feature-tuple grouping under ANSI
    "dup_span_char_offsets",  # NEW r14: ASCII \S+ offset kernel + interval joins under ANSI
    "strip_dup_spans_exact",  # NEW r14: substring fold over char cuts under ANSI
    "strip_repeated_lines",   # NEW r14: prefix-exists keep-first filter under ANSI
    "lsh_mrr_report",         # NEW r14: min-rank join + 1/rank division under ANSI
    "bpe_decode",             # NEW r14: id->token map inversion + </w> re-split
    "dup_ngram_fraction",     # NEW r14: staged nested HOF scans + element_at under ANSI
]


@pytest.mark.parametrize("name", HOSTILE_QUERIES)
def test_oracle_parity_under_hostile_session(spark, sf_oracle, name):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        fn, sql = REGISTRY[name]
        got = _normalize(fn(spark, sf_oracle).toPandas())
        want = _normalize(_duck(sf_oracle, sql))
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want)
        for c in got.columns:
            assert list(got[c].astype(str)) == list(want[c].astype(str)), c
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)
