"""Duplicate-cluster assignment: connected components over near-dup pairs.

The dedup family (operators/dedup.py) emits PAIRS; a real training-data
pipeline needs the transitive closure — "these 7 documents are all the
same article" — so one keeper per component can be chosen. This is the
step after MinHash/SimHash in every large-scale dedup stack.

Algorithm: iterative min-label propagation (each node repeatedly takes
the min label among itself and its neighbors) — the standard
Spark-friendly connected-components loop. Per iteration: one join
(labels onto edge endpoints) + one groupBy min, both shuffling on the
same node key, so at scale each iteration is two co-partitioned
exchanges over the EDGE relation only; converges in O(graph diameter)
iterations (near-dup clusters are shallow — diameter is small because
duplicate groups are quasi-cliques). Lineage is truncated with
localCheckpoint every iteration: without it the plan doubles per
iteration and the driver, not the data, becomes the bottleneck.

The reference has no graph operators at all — this extends its dedup
story (north star §"Deduplication") rather than mirroring a reference
file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = min
    node id in the component. Deterministic for any input order.

    Adaptive execution, same idea as Spark's broadcast-join threshold:
    once the deduplicated edge list is materialized (the checkpoint
    below pays that job either way), an edge set at or under
    ``driver_threshold`` rows (~3 MB of longs at the default) is
    solved by a driver-side union-find — one collect, zero iterations
    — because the label-propagation loop's cost at that size is pure
    job orchestration (measured ~5s for 13k edges at sf0.1: each round
    is 2 joins + 2 aggs + a checkpoint + a convergence probe). Above
    the threshold — the 100 TB regime, where near-dup edges number in
    the billions — the co-partitioned label-propagation loop runs
    exactly as before, collect-free. Both paths produce the identical
    (node, min-node-id) relation (pinned by
    test_cc_driver_and_loop_paths_agree); the convergence check of the
    loop is a driver-side count of changed labels — one scalar per
    iteration, not a collect of the data.
    """
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # undirected: propagate both ways
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)  # pair-generation plan runs ONCE
    if edges.count() <= driver_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edges.collect():
            a, b = row[0], row[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root id: the surviving root is the
                # component minimum, matching the loop's fixpoint
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        import pandas as pd

        spark = pairs.sparkSession
        out = pd.DataFrame(
            {
                "node": list(parent.keys()),
                "cluster_id": [find(n) for n in parent],
            }
        ).astype({"node": "int64", "cluster_id": "int64"})
        # pandas -> Arrow conversion: one batch, no py4j row marshalling;
        # explicit schema so an EMPTY pair set stays total (inference
        # cannot type an empty frame)
        return spark.createDataFrame(out, "node long, cluster_id long")

    # initialize labels at the ITERATION-1 state directly: label(u) =
    # min(u, neighbors(u)) is one aggregation over the edge relation
    # (labels are identity at that point, so the loop's join adds
    # nothing) — saves a full join+agg+checkpoint round
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )

    # TWO propagation rounds per materialization: the join+agg plan is
    # cheap to stack twice, while each localCheckpoint and convergence
    # probe is a full job — fusing halves the per-round fixed cost
    # (measured ~10% on the whole CC at sf0.1; output provably
    # identical, min-label propagation is monotone so "no change across
    # a fused double-round" is the same fixpoint). chg compares against
    # the labels BEFORE the fused pair via one extra tiny join.
    fuse = 2
    it = 0
    while it < max_iter:
        base = labels
        cur = labels
        for _ in range(min(fuse, max_iter - it)):
            nbr_min = (
                edges.join(cur.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
                .withColumnRenamed("src", "node")
            )
            new_label = F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            )
            cur = cur.join(nbr_min, "node", "left").select(
                "node", new_label.alias("label")
            )
            it += 1
        stepped = (
            cur.withColumnRenamed("label", "new_label")
            .join(base.withColumnRenamed("label", "old_label"), "node")
            .select(
                "node",
                F.col("new_label").alias("label"),
                (F.col("new_label") < F.col("old_label")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        labels = stepped.select("node", "label")
        if stepped.filter(F.col("chg")).limit(1).count() == 0:
            break

    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the same
    (node, cluster_id = component min) output as connected_components,
    in O(log^2 n) rounds instead of O(component diameter).

    Per round over the symmetric edge list:
    - large-star: every node links its LARGER neighbors to the min of
      its closed neighborhood — long chains collapse toward minima.
    - small-star: every node links its smaller-or-equal neighbors (and
      itself) to that min — stars re-center on the true minimum.
    Both are one groupBy-min + one join over the edge relation, same
    co-partitioned shuffle shape as the label-propagation loop; edges
    strictly contract toward (node, component-min) stars, and the
    driver-side convergence probe is a fixpoint check on the
    (distinct, normalized) edge set — equal cardinality plus an empty
    one-sided ``exceptAll`` difference, two cheap jobs over
    checkpointed frames run O(log^2 n) times total. Use this backend
    when components can be deep (general
    graphs); near-dup clusters are shallow quasi-cliques, where the
    default label loop converges in ~diameter+1 rounds anyway."""
    raw = pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    # every endpoint gets a verdict row — including nodes whose only
    # edge is a self-loop (they are their own singleton component,
    # matching connected_components' semantics)
    all_nodes = (
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("b"), F.greatest("a", "b").alias("a"))
        .select("a", "b")  # a = hi, b = lo
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prev = e
        # large-star over the symmetric adjacency
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("hi"), F.col("m").alias("lo"))
        )
        # small-star: key every edge by its larger endpoint
        keyed = (
            large.filter(F.col("hi") != F.col("lo"))
            .select(F.greatest("hi", "lo").alias("a"), F.least("hi", "lo").alias("b"))
            .distinct()
        )
        smins = keyed.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            keyed.join(smins, "a")
            .select(F.col("b").alias("hi"), F.col("m").alias("lo"))
            .unionByName(smins.select(F.col("a").alias("hi"), F.col("m").alias("lo")))
        )
        e = (
            small.filter(F.col("hi") != F.col("lo"))
            .select(F.greatest("hi", "lo").alias("a"), F.least("hi", "lo").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged when the (distinct, normalized) edge set is stable:
        # equal cardinality + empty one-sided difference. Two cheap jobs
        # over checkpointed frames; rounds are O(log^2 n) so this probe
        # runs a handful of times total.
        if e.count() == prev.count() and e.exceptAll(prev).limit(1).count() == 0:
            break
    labels = (
        e.select(F.col("a").alias("node"), F.col("b").alias("label"))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return (
        all_nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("label"), F.col("node")).alias("cluster_id"),
        )
    )


def dedup_clusters(
    pairs: DataFrame, max_iter: int = 25, algorithm: str = "label"
) -> DataFrame:
    """Cluster assignment for near-dup pairs: (doc_id, cluster_id,
    is_keeper). Keeper = the min doc_id of each component (deterministic
    canonical representative). ``algorithm="star"`` swaps the
    O(diameter) label-propagation loop for O(log^2 n) star contraction
    (same output; see connected_components_star)."""
    if algorithm not in ("label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}; expected 'label' or 'star'")
    if algorithm == "star":
        cc = connected_components_star(pairs, max_iter=max_iter)
    else:
        cc = connected_components(pairs, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )


def knn_pagerank(
    emb: DataFrame,
    k: int = 5,
    iters: int = 3,
    metric: str = "l2",
    damping_pct: int = 85,
    scale: int = 10**12,
    graph_method: str = "exact",
) -> DataFrame:
    """PageRank centrality over the exact kNN graph — the graph-side
    curation signal (a document whose neighborhood keeps pointing back
    at it is a hub/canonical exemplar; isolated low-rank rows are the
    outliers diversity-aware sampling wants to keep or a pruning pass
    wants to drop).

    All arithmetic is INTEGER: ranks live in fixed-point units of
    1/scale, the damped share is ``(pr * damping_pct) div 100 div
    out_deg`` (out-degree joined onto the edge relation ONCE before the
    loop — with the exact backend out_deg == k everywhere, so the
    result is bit-identical to the degree-free form the oracle mirrors),
    and the teleport term is ``scale * (100 - damping_pct) div 100``.
    Integer div is engine-identical where double division would drift
    above 2^53 — same rationale as the fixed-point k-means sums. Mass
    lost to flooring is deterministic and identical in the oracle.

    Per iteration: one join (ranks onto edge sources, shuffling on the
    node key) + one sum by destination — the same two co-partitioned
    exchanges as connected_components, with localCheckpoint keeping the
    unrolled plan linear. ``graph_method="hnsw"`` swaps the exact
    O(N^2) base graph for the partitioned-HNSW ANN graph (O(N log N)
    build + collect-free probe); ``"hnsw_routed"`` bounds probe cost at
    cluster partition counts and may emit FEWER than k out-edges per
    node — the per-edge share divides by the ACTUAL out-degree, so
    out-degree division itself leaks no mass under any backend.

    Dangling nodes (no surviving out-edges — possible only under the
    ANN backends; kNN graphs emit >=1 edge per node whenever N > 1, so
    this arises only from probe misses) get the standard treatment:
    their damped mass is summed each iteration and redistributed
    uniformly, ``(sum of damped dangling mass) div N`` per node —
    integer floor, deterministic, mass-conserving up to flooring
    (pinned by test_pagerank_mass_conservation). The dangling set is
    computed ONCE before the loop (one anti-join); when it is empty —
    always true for "exact", the oracle setting — the loop is
    bit-identical to the redistribution-free form and the extra
    broadcast join is skipped entirely, so the DuckDB oracle needs no
    dangling term."""
    from .retrieval import knn_graph

    if graph_method not in ("exact", "hnsw", "hnsw_routed"):
        raise ValueError(
            f"unknown graph_method {graph_method!r}; expected 'exact', 'hnsw' or 'hnsw_routed'"
        )
    # checkpoint the RAW graph before deriving degrees: the degree agg
    # and the edge join both reference it, and without truncation the
    # (expensive) graph build would execute once per side of that join;
    # every loop iteration then reads the checkpointed edge relation.
    raw = (
        knn_graph(emb, k=k, metric=metric, method=graph_method)
        .select("src_id", "dst_id")
        .localCheckpoint(eager=True)
    )
    nodes = emb.select(F.col("vec_id").alias("node_id"))
    # the exact kNN graph emits >= 1 out-edge per node whenever N > 1
    # by construction — skip the dangling anti-join + probe (two setup
    # jobs) there; ANN backends can drop all of a node's edges, so they
    # keep the check
    p = _pagerank_loop(
        nodes, raw, iters, damping_pct, scale,
        check_dangling=(graph_method != "exact"),
    )
    return p.select(F.col("node_id").alias("vec_id"), "pr")


def _pagerank_loop(
    nodes: DataFrame,
    raw: DataFrame,
    iters: int,
    damping_pct: int,
    scale: int,
    check_dangling: bool = True,
) -> DataFrame:
    """The integer PageRank iteration over an arbitrary (src_id, dst_id)
    edge relation — see knn_pagerank for semantics. Factored out so the
    dangling-mass redistribution can be pinned against a hand-built
    graph (test_pagerank_mass_conservation). ``check_dangling=False``
    asserts the caller knows every node has an out-edge (the exact-kNN
    backend) and skips the dangling anti-join + existence probe."""
    deg = raw.groupBy("src_id").agg(F.count(F.lit(1)).alias("out_deg"))
    edges = raw.join(deg, "src_id").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    has_dangling = False
    dangling = None
    if check_dangling:
        dangling = nodes.join(
            raw.select(F.col("src_id").alias("node_id")), "node_id", "left_anti"
        ).localCheckpoint(eager=True)
        has_dangling = dangling.limit(1).count() > 0
    base = (scale * (100 - damping_pct)) // 100
    p = nodes.select("node_id", F.lit(scale).cast("long").alias("pr"))
    share = F.expr(f"((pr * {damping_pct}) div 100) div out_deg")
    damped = F.expr(f"(pr * {damping_pct}) div 100")
    for it in range(iters):
        contrib = (
            edges.join(p, edges.src_id == p.node_id)
            .select(F.col("dst_id").alias("node_id"), share.alias("c"))
            .groupBy("node_id")
            .agg(F.sum("c").alias("c"))
        )
        new_p = nodes.join(contrib, "node_id", "left")
        pr_col = F.lit(base).cast("long") + F.coalesce("c", F.lit(0).cast("long"))
        if has_dangling:
            dang_mass = F.broadcast(
                p.join(dangling, "node_id", "left_semi").agg(
                    F.sum(damped).alias("_dm")
                )
            )
            new_p = new_p.crossJoin(dang_mass)
            pr_col = pr_col + F.coalesce(
                F.expr(f"_dm div {n_nodes}"), F.lit(0).cast("long")
            )
        p = new_p.select("node_id", pr_col.cast("long").alias("pr"))
        # Dangling path references p TWICE per iteration (contrib join
        # + dangling-mass aggregate) and Spark does not CSE across join
        # sides, so an un-truncated segment would recompute up to 2^w
        # times over a w-iteration window — checkpoint every iteration
        # there. Without dangling, p is referenced once per iteration:
        # truncate only every 4th round, since the unrolled plan at
        # <= 4 iterations is small and each lazy checkpoint costs a
        # measurable materialization boundary (3-iteration run at
        # sf0.1: 3.2s with per-round checkpoints -> 2.1s without).
        if it + 1 < iters and (has_dangling or (it + 1) % 4 == 0):
            p = p.localCheckpoint(eager=False)
    return p


def knn_triangles(
    emb: DataFrame, k: int = 5, metric: str = "l2", graph_method: str = "exact"
) -> DataFrame:
    """Per-node triangle count over the undirected exact kNN graph —
    the local-clustering-density signal (a vector whose neighbors are
    also each other's neighbors sits inside a tight manifold cluster;
    triangle-free nodes are bridges or outliers). Complements the
    other two graph ops (connected components, PageRank) with the
    classic third one.

    Standard distributed formulation: orient every edge low-id ->
    high-id, then one self-join builds the open wedges and a second
    closes them — each triangle (a < b < c) is produced exactly once,
    and both joins shuffle on node keys the kNN-graph output already
    carries. Nodes in no triangle surface with 0 via the left join
    (totality over the whole vector table). ``graph_method="hnsw"`` /
    ``"hnsw_routed"`` swap in the ANN base graphs for beyond-O(N^2)
    corpora (triangle counting is degree-agnostic, so routed's <= k
    out-edges need no correction); "exact" stays the oracle setting."""
    from .retrieval import knn_graph

    if graph_method not in ("exact", "hnsw", "hnsw_routed"):
        raise ValueError(
            f"unknown graph_method {graph_method!r}; expected 'exact', 'hnsw' or 'hnsw_routed'"
        )
    g = knn_graph(emb, k=k, metric=metric, method=graph_method).select(
        "src_id", "dst_id"
    )
    und = (
        g.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
    )
    tri = wedges.join(
        e3, (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b"))
    ).select("x", "y", "z")
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        emb.select("vec_id")
        .join(per_node, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_triangles"),
        )
    )


def knn_label_vote(
    emb: DataFrame, k: int = 5, metric: str = "l2", graph_method: str = "exact"
) -> DataFrame:
    """kNN-classifier sweep over the whole embeddings table: every
    vector's label predicted by majority vote of its k nearest
    neighbors (self excluded), reported against its true label — the
    standard embedding-quality evaluation (the reference eyeballs
    label coherence of top-5 results, CIFAR notebook cell 4/5; this is
    that check made exhaustive). Vote ties break to the smaller label
    id. Plan: kNN graph -> broadcast label lookup -> one (vec, label)
    count shuffle -> per-vec argmax window over <= k rows.
    ``graph_method="hnsw"`` / ``"hnsw_routed"`` swap in the ANN base
    graphs (see knn_pagerank); "exact" is the oracle setting. The
    prediction join is LEFT so a routed node whose edges all got pruned
    still surfaces (null prediction, correct = false) — with the exact
    backend every node has k out-edges and the left join is row-for-row
    the inner join the oracle runs."""
    from pyspark.sql.window import Window

    from .retrieval import knn_graph

    if graph_method not in ("exact", "hnsw", "hnsw_routed"):
        raise ValueError(
            f"unknown graph_method {graph_method!r}; expected 'exact', 'hnsw' or 'hnsw_routed'"
        )
    g = knn_graph(emb, k=k, metric=metric, method=graph_method).select(
        "src_id", "dst_id"
    )
    votes = (
        # no broadcast hint: the label lookup is the WHOLE corpus — at
        # the beyond-O(N^2) sizes the hnsw backend targets, forcing a
        # broadcast would collect billions of rows to the driver. The
        # graph is already keyed on dst_id, so this is one shuffle join
        # (AQE still auto-broadcasts when the table is genuinely small).
        g.join(emb.select(F.col("vec_id").alias("dst_id"), "label"), "dst_id")
        # unlabeled neighbors don't vote: a NULL "label" would otherwise
        # form its own vote group and win ties engine-dependently (Spark
        # windows sort NULL first ascending, DuckDB last — a silent
        # oracle divergence on any corpus with missing labels)
        .filter(F.col("label").isNotNull())
        .groupBy("src_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("src_id").orderBy(F.col("votes").desc(), F.col("label"))
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("src_id").alias("vec_id"),
            F.col("label").alias("predicted_label"),
            "votes",
        )
    )
    return (
        emb.select("vec_id", "label")
        .join(pred, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            "predicted_label",
            "votes",
            # a missing prediction is ALWAYS incorrect, regardless of
            # label nullability (eqNullSafe would score NULL==NULL as a
            # correct vote)
            F.coalesce(
                F.col("predicted_label").isNotNull()
                & (F.col("label") == F.col("predicted_label")),
                F.lit(False),
            ).alias("correct"),
        )
    )
