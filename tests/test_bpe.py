"""BPE tokenizer-training semantics (operators/bpe.py). Cross-engine
parity is covered by test_oracle_parity.py; these tests pin the
algorithm against a pure-Python Sennrich-style reference and the greedy
non-overlap rule on adversarial runs."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.functions.text import bpe_tokens
from vectorsearch_with_hnsw_spark.operators.bpe import bpe_segment, bpe_train
from vectorsearch_with_hnsw_spark.sources import load_table


def _reference_bpe(vocab: dict[str, int], n_merges: int):
    """Sennrich alg. 1 with greedy left-to-right merge application and
    (count desc, left asc, right asc) tie-break — the contract
    bpe_train implements."""
    sv = collections.Counter()
    for w, c in vocab.items():
        sv[tuple(list(w) + ["</w>"])] += c
    merges = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for syms, c in sv.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        nsv = collections.Counter()
        for syms, c in sv.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nsv[tuple(out)] += c
        sv = nsv
    return merges


def test_bpe_train_matches_reference(spark, sf_smoke):
    """The distributed loop reproduces the reference trainer exactly,
    with the vocabulary built from the engine's own pretokens (so the
    test isolates the training loop, not the regex)."""
    docs = load_table(spark, sf_smoke, "documents")
    vocab = {
        r["word"]: r["freq"]
        for r in docs.select(F.explode(bpe_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    want = _reference_bpe(vocab, 6)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    assert got == want


def test_bpe_merge_greedy_nonoverlap(spark):
    """Adversarial same-symbol runs: 'aaaa' under merge (a,a) becomes
    [aa, aa, </w>] (greedy left-to-right, no overlap), and 'aaa'
    becomes [aa, a, </w>] — pinned through a crafted corpus where
    (a, a) is the most frequent pair."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa"), (1, "aaaa bb")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=1).collect()
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "a")
    # aaaa: pairs (a,a)x3 -> greedy merges at pos 1-2 and 3-4
    seg = {
        r["doc_id"]: r["n_subwords"]
        for r in bpe_segment(docs, [("a", "a")]).collect()
    }
    # doc 0: 'aaaa'(2+</w>=3) + ' aaaa'(space sym + 2 + </w> = 4) + ' aaa'(space + aa + a + </w> = 4) = 11
    assert seg[0] == 11
    # doc 1: 'aaaa'(3) + ' bb'(space + b + b + </w> = 4) = 7
    assert seg[1] == 7


def test_bpe_segment_monotone(spark, sf_smoke):
    """Each applied merge can only shrink (or keep) the subword count,
    and zero merges means n_subwords = total chars + one end marker per
    pretoken."""
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    base = bpe_segment(docs, [])
    stepped = [bpe_segment(docs, merges[:i]) for i in (1, 2, 4)]
    rows0 = {r["doc_id"]: r["n_subwords"] for r in base.collect()}
    prev = rows0
    for df in stepped:
        cur = {r["doc_id"]: r["n_subwords"] for r in df.collect()}
        assert all(cur[d] <= prev[d] for d in cur)
        prev = cur
    # zero-merge identity: subwords = sum over pretokens of len + 1
    chk = docs.select(
        "doc_id",
        F.aggregate(
            F.transform(bpe_tokens(F.col("text")), lambda w: F.length(w) + F.lit(1)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("want"),
    )
    want = {r["doc_id"]: r["want"] for r in chk.collect()}
    assert rows0 == want


def test_apply_merge_fold_fuzz(spark):
    """The native aggregate fold matches the Python greedy scan on 60
    seeded random symbol arrays over a 3-symbol alphabet — including
    same-symbol runs, pair-at-boundary, and empty arrays."""
    import random

    from vectorsearch_with_hnsw_spark.operators.bpe import _apply_merge

    rng = random.Random(1234)
    cases = [
        [rng.choice(["a", "b", "ab"]) for _ in range(rng.randrange(0, 12))]
        for _ in range(60)
    ]
    pairs = [("a", "a"), ("a", "b"), ("ab", "a"), ("b", "b")]

    def py_merge(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
    )
    for a, b in pairs:
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", _apply_merge(F.col("syms"), a, b).alias("m")
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == py_merge(c, a, b), (a, b, c, got[i])


def test_bpe_train_incremental_parity(spark, sf_smoke):
    """The incremental (maintained pair-count) mode is bit-identical to
    the full-recount mode on the real corpus — same merges, same
    counts, same order. This is the exactness claim that lets the
    registry hash the incremental path against the same unrolled-CTE
    oracle."""
    docs = load_table(spark, sf_smoke, "documents")
    simple = [
        tuple(r) for r in bpe_train(docs, n_merges=6, incremental=False)
        .orderBy("merge_rank").collect()
    ]
    incr = [
        tuple(r) for r in bpe_train(docs, n_merges=6, incremental=True)
        .orderBy("merge_rank").collect()
    ]
    assert incr == simple


def test_bpe_train_incremental_exhaustion(spark):
    """Early vocabulary exhaustion returns the same shorter merge table
    in both modes (the oracle degrades identically — bpe.py docstring)."""
    docs = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    simple = bpe_train(docs, n_merges=50, incremental=False).collect()
    incr = bpe_train(docs, n_merges=50, incremental=True).collect()
    assert [tuple(r) for r in incr] == [tuple(r) for r in simple]
    assert 0 < len(simple) < 50


def test_bpe_train_releases_all_checkpoints(spark, sf_smoke):
    """VERDICT r12 #3: a library caller must not accumulate pinned
    checkpoint blocks per training call. Both modes leave ZERO
    persistent RDDs behind — measured as a delta so an unrelated
    pre-pinned block doesn't mask or fake a leak."""
    docs = load_table(spark, sf_smoke, "documents")
    jsc = spark.sparkContext._jsc
    before = int(jsc.getPersistentRDDs().size())
    bpe_train(docs, n_merges=5, incremental=False).collect()
    assert int(jsc.getPersistentRDDs().size()) == before
    bpe_train(docs, n_merges=5, incremental=True).collect()
    assert int(jsc.getPersistentRDDs().size()) == before


def test_bpe_train_incremental_deep_merge_lineage_bounded(spark, sf_smoke):
    """Regression pin for the round-13 lineage bug: lazy vocab
    checkpoint marks were never truncated in incremental mode (every
    job ended at an eagerly-checkpointed pair-count RDD, and
    doCheckpoint stops at the first marked RDD), so the serialized
    lineage grew ~3 frames per merge until task deserialization
    StackOverflowed near merge 150. 150 merges must complete, agree
    with the full-recount mode on a 20-merge prefix (the merge sequence
    is prefix-stable: each merge depends only on earlier ones), and
    leave no pinned blocks."""
    docs = load_table(spark, sf_smoke, "documents")
    jsc = spark.sparkContext._jsc
    before = int(jsc.getPersistentRDDs().size())
    deep = bpe_train(docs, n_merges=150, incremental=True).orderBy("merge_rank")
    rows = [tuple(r) for r in deep.collect()]
    # the smoke corpus exhausts its pair vocabulary around merge 144 —
    # deep enough that the pre-fix lineage (~3 frames/merge) would be
    # ~430 frames here vs a constant ~3 after the fix
    assert 100 < len(rows) <= 150
    assert int(jsc.getPersistentRDDs().size()) == before
    prefix = [
        tuple(r)
        for r in bpe_train(docs, n_merges=20, incremental=False)
        .orderBy("merge_rank")
        .collect()
    ]
    assert rows[:20] == prefix


def test_bpe_vocab_dense_ids_and_coverage(spark, sf_smoke):
    """Vocab ids are dense 1..N by (freq desc, token), tokens unique,
    and the vocab covers every symbol the encode path can emit (so a
    trained-on-corpus encode never yields a NULL id)."""
    from vectorsearch_with_hnsw_spark.operators.bpe import bpe_encode, bpe_vocab

    docs = load_table(spark, sf_smoke, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    voc = bpe_vocab(docs, merges).collect()
    ids = sorted(r["token_id"] for r in voc)
    assert ids == list(range(1, len(voc) + 1))
    assert len({r["token"] for r in voc}) == len(voc)
    freqs = {r["token_id"]: r["token_freq"] for r in voc}
    assert all(freqs[i] >= freqs[i + 1] for i in range(1, len(voc)))
    enc = bpe_encode(docs, merges, bpe_vocab(docs, merges))
    n_null = enc.select(
        F.explode("token_ids").alias("t")
    ).filter(F.col("t").isNull()).count()
    assert n_null == 0


def test_bpe_encode_roundtrip_and_counts(spark, sf_smoke):
    """Decoding the id sequence through the vocab reconstructs the
    document's pretoken stream exactly (token order is pinned, not just
    the multiset), and n_tokens agrees with bpe_segment's n_subwords."""
    from vectorsearch_with_hnsw_spark.operators.bpe import bpe_encode, bpe_vocab

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    voc = {r["token_id"]: r["token"] for r in bpe_vocab(docs, merges).collect()}
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges, bpe_vocab(docs, merges)).collect()}
    seg = {r["doc_id"]: r["n_subwords"] for r in bpe_segment(docs, merges).collect()}
    pre = {
        r["doc_id"]: r["pp"]
        for r in docs.select(
            "doc_id", F.concat_ws("\x00", bpe_tokens(F.col("text"))).alias("pp")
        ).collect()
    }
    for d, row in enc.items():
        assert row["n_tokens"] == seg[d]
        decoded = "".join(voc[i] for i in row["token_ids"])
        # each pretoken's symbols end with '</w>' — splitting on it
        # recovers the pretoken stream
        words = [w for w in decoded.split("</w>") if w != ""]
        want = [w for w in pre[d].split("\x00") if w != ""]
        assert words == want, d


def test_word_syms_py_matches_expression_fuzz(spark):
    """The Arrow-kernel symbolizer (_word_syms_py, with its absent-
    symbol skip) is bit-identical to the nested-HOF expression
    (_word_syms) on 40 seeded random words under ADVERSARIAL merge
    lists — merges that chain (output of one is input of a later one),
    merges out of trained order, same-symbol pairs, and merges that
    never apply. This is the contract that lets auto-dispatch switch
    paths by merge count alone."""
    import random

    from vectorsearch_with_hnsw_spark.operators.bpe import (
        _word_syms,
        _word_syms_py,
    )

    rng = random.Random(99)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randrange(0, 10)))
        for _ in range(40)
    ]
    merge_lists = [
        [("a", "b"), ("ab", "c"), ("a", "a"), ("abc", "</w>"), ("b", "b")],
        [("c", "c"), ("cc", "cc"), ("a", "cccc"), ("b", "a"), ("ba", "ba")],
        [("b", "</w>"), ("a", "b</w>"), ("ab</w>", "ab</w>"), ("z", "q")],
        [(rng.choice(["a", "b", "c", "ab", "bc"]),
          rng.choice(["a", "b", "c", "ab", "bc"])) for _ in range(20)],
    ]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i int, w string")
    for merges in merge_lists:
        got = {
            r["i"]: r["s"]
            for r in df.select("i", _word_syms(F.col("w"), merges).alias("s")).collect()
        }
        for i, w in enumerate(words):
            assert got[i] == _word_syms_py(w, merges), (w, merges, got[i])


def test_bpe_kernel_paths_match_expr(spark, sf_smoke):
    """encode/vocab/segment forced through the Arrow kernel produce
    row-identical results to the declarative expression path on trained
    merges — the bit-parity gate for the auto dispatch that kicks in
    above EXPR_MAX_MERGES (where the expression path cannot analyze at
    all)."""
    from vectorsearch_with_hnsw_spark.operators.bpe import bpe_encode, bpe_vocab

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    voc_e = sorted(map(tuple, bpe_vocab(docs, merges, method="expr").collect()))
    voc_k = sorted(map(tuple, bpe_vocab(docs, merges, method="kernel").collect()))
    assert voc_e == voc_k
    vocab = bpe_vocab(docs, merges)
    enc_e = sorted(
        (r["doc_id"], r["n_tokens"], tuple(r["token_ids"]))
        for r in bpe_encode(docs, merges, vocab, method="expr").collect()
    )
    enc_k = sorted(
        (r["doc_id"], r["n_tokens"], tuple(r["token_ids"]))
        for r in bpe_encode(docs, merges, vocab, method="kernel").collect()
    )
    assert enc_e == enc_k
    seg_e = sorted(map(tuple, bpe_segment(docs, merges, method="expr").collect()))
    seg_k = sorted(map(tuple, bpe_segment(docs, merges, method="kernel").collect()))
    assert seg_e == seg_k


def test_bpe_encode_large_merge_list_auto_kernel(spark, sf_smoke):
    """Above EXPR_MAX_MERGES the auto dispatch must route around the
    expression path (which analyzer-fails near 128 merges) and still
    satisfy the encode contract: decoding through the vocab recovers
    the pretoken stream exactly at 300 merges. Also pins that 'auto'
    really selects the kernel (an exchange-free mapInPandas plan, no
    nested-HOF chain)."""
    from vectorsearch_with_hnsw_spark.operators.bpe import (
        EXPR_MAX_MERGES,
        bpe_encode,
        bpe_vocab,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    # synthetic chained merge list — training 300 real merges is
    # minutes; encode cost/semantics depend only on the list shape
    merges = []
    for c1 in "abcdefghijklmnopqrst":
        left = c1
        for c2 in "aeiou</w>xyzqw":
            if c2 == "<":
                right = "</w>"
            else:
                right = c2
            merges.append((left, right))
            left = left + right
            if len(merges) >= 300:
                break
        if len(merges) >= 300:
            break
    assert len(merges) > EXPR_MAX_MERGES
    vocab = bpe_vocab(docs, merges)
    enc = bpe_encode(docs, merges, vocab)
    # plan pin on the UNLIMITED table (the test's own limit(40) adds a
    # GlobalLimit exchange that has nothing to do with the operator):
    # the kernel encode is one mapInPandas over the scan, exchange-free
    full = bpe_encode(load_table(spark, sf_smoke, "documents"), merges, vocab)
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "mapInPandas" in plan or "MapInPandas" in plan, plan
    voc = {r["token_id"]: r["token"] for r in vocab.collect()}
    pre = {
        r["doc_id"]: [w for w in r["pp"].split("\x00") if w != ""]
        for r in docs.select(
            "doc_id", F.concat_ws("\x00", bpe_tokens(F.col("text"))).alias("pp")
        ).collect()
    }
    rows = enc.collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] == len(r["token_ids"])
        assert all(i is not None for i in r["token_ids"])
        decoded = "".join(voc[i] for i in r["token_ids"])
        words = [w for w in decoded.split("</w>") if w != ""]
        assert words == pre[r["doc_id"]], r["doc_id"]


def test_bpe_decode_roundtrip(spark, sf_smoke):
    """decode(encode(docs)) reproduces the canonical pretoken stream
    exactly for a trained-on-corpus vocab — the tokenizer loop's last
    edge; and an id missing from the vocab decodes as empty (NULL-id
    mirror)."""
    from vectorsearch_with_hnsw_spark.operators.bpe import (
        bpe_decode,
        bpe_encode,
        bpe_vocab,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
    ]
    vocab = bpe_vocab(docs, merges)
    got = {
        r["doc_id"]: r["text_decoded"]
        for r in bpe_decode(bpe_encode(docs, merges, vocab), vocab).collect()
    }
    want = {
        r["doc_id"]: r["pp"]
        for r in docs.select(
            "doc_id", F.concat_ws(" ", bpe_tokens(F.col("text"))).alias("pp")
        ).collect()
    }
    assert got == want
    # unknown id -> empty decode contribution
    enc = spark.createDataFrame(
        [(1, [999999])], "doc_id long, token_ids array<int>"
    )
    row = bpe_decode(enc, vocab).collect()[0]
    assert row["text_decoded"] == "" and row["n_tokens"] == 1


def test_bpe_null_text_encodes_as_zero_pretoken_doc(spark):
    """A NULL text row pretokenizes to [] on BOTH dispatch paths: encode
    gives (0, []) and segment (0, 0), expression and kernel agreeing —
    before the guard, the expression path NULLed through while the
    corpus-side Arrow kernel raised TypeError on `for w in words` and
    killed the task."""
    from vectorsearch_with_hnsw_spark.operators.bpe import (
        bpe_encode,
        bpe_segment,
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    vocab = bpe_vocab(docs, merges)
    for method in ("expr", "kernel"):
        enc = {
            r.doc_id: (r.n_tokens, list(r.token_ids))
            for r in bpe_encode(docs, merges, vocab, method=method).collect()
        }
        assert enc[2] == (0, []), f"{method}: NULL doc must encode as (0, [])"
        assert enc[3] == (0, [])
        assert enc[1][0] > 0
        seg = {
            r.doc_id: (r.n_pretokens, r.n_subwords)
            for r in bpe_segment(docs, merges, method=method).collect()
        }
        assert seg[2] == (0, 0), f"{method}: NULL doc must segment as (0, 0)"
        assert seg[3] == (0, 0)
