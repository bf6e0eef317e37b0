"""Physical-plan shape assertions — the scale contract, checked.

Correctness tests prove the operators return the right rows at small
sf; these prove the PLANS are the ones that survive a 100 TB / 1000-
executor scale-up: projections and filters reach the parquet scan,
small dimension tables broadcast instead of shuffling the fact side,
top-k runs as TakeOrderedAndProject (per-partition heaps, no global
sort), and aggregations are partial (map-side combine) before the
shuffle. A regression in any of these is invisible to row-equality
tests but catastrophic at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_vectorsearch_spark.sources.tables import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_projection_and_filter_reach_parquet_scan(spark, sf_correct):
    """S1/S2/F1: a 2-column projection with a filter must scan only those
    columns (ReadSchema) and push the predicate (PushedFilters) — a scan
    reading all columns for a narrow projection is wrong at any scale."""
    docs = load_table(spark, sf_correct, "documents")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _executed_plan(q)
    scan = plan[plan.index("FileScan") :]
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema  # the wide column stays unread
    assert "PushedFilters: [" in scan
    assert "lang" in scan.split("PushedFilters:")[1][:200]


def test_small_dimension_join_broadcasts(spark, sf_correct):
    """J1: fact ⋈ small-dim must be a broadcast hash join — shuffling the
    fact side on the join key to meet a KB-sized dimension table is the
    classic scale failure."""
    orders = load_table(spark, sf_correct, "orders")
    cust = load_table(spark, sf_correct, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    q = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    plan = _executed_plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_correct):
    """T2: brute-force top-k must compile to TakeOrderedAndProject
    (per-partition heaps merged on the driver), never a global Sort of
    the full corpus followed by a limit."""
    from go_vectorsearch_spark.operators.search import brute_force_topk

    emb = load_table(spark, sf_correct, "embeddings")
    qvec = [float(x) for x in emb.select("embedding").head()[0]]
    q = brute_force_topk(emb, qvec, 10)
    plan = _executed_plan(q)
    assert "TakeOrderedAndProject" in plan


def test_groupby_aggregation_is_partial(spark, sf_correct):
    """A2: groupBy-count must map-side combine (partial_count before the
    exchange, merge_count after) so the shuffle carries one row per
    (partition, key), not one per input row."""
    docs = load_table(spark, sf_correct, "documents")
    q = docs.groupBy("lang").count()
    plan = _executed_plan(q)
    # the tree prints top-down: everything after the Exchange line is the
    # map side — the partial agg must sit there, between scan and shuffle
    assert "partial_count" in plan.split("Exchange")[1]


def test_semi_join_stays_semi(spark, sf_correct):
    """J3: hydration by key list must plan as a (broadcast) semi join —
    no full join + distinct, which would shuffle and dedup the fact
    side."""
    emb = load_table(spark, sf_correct, "embeddings")
    keys = spark.range(5).withColumnRenamed("id", "vec_id")
    q = emb.join(F.broadcast(keys), "vec_id", "left_semi")
    plan = _executed_plan(q)
    assert "LeftSemi" in plan
    assert "Aggregate" not in _optimized_plan(q)


def test_in_list_lookup_pushes_down(spark, sf_correct):
    """S4/F2: an IN-list point lookup must reach the scan as a pushed
    filter, the parquet analog of the reference's PK index scan."""
    from go_vectorsearch_spark.operators.relational import lookup_by_keys

    orders = load_table(spark, sf_correct, "orders")
    q = lookup_by_keys(orders, "o_orderkey", [1, 2, 3])
    plan = _executed_plan(q)
    assert "PushedFilters: [In(o_orderkey" in plan


def test_scored_search_has_no_shuffle_before_topk(spark, sf_correct):
    """J4: cosine scoring is a narrow map — the only exchange in a
    brute-force search plan is the single-partition merge feeding the
    final top-k, never a repartition of scored rows."""
    from go_vectorsearch_spark.operators.search import score_cosine

    emb = load_table(spark, sf_correct, "embeddings")
    qvec = [float(x) for x in emb.select("embedding").head()[0]]
    q = score_cosine(emb, qvec, "embedding")
    plan = _executed_plan(q)
    assert "Exchange" not in plan  # pure projection over the scan


def test_pack_sequences_no_global_sort(spark, sf_correct):
    """Sequence packing must shuffle once on the shard hash and sort only
    WITHIN shard partitions (window) - a global ORDER BY would funnel the
    100 TB corpus through one task."""
    from go_vectorsearch_spark.operators.curation import pack_sequences

    docs = load_table(spark, sf_correct, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_tokens")
    )
    q = pack_sequences(docs, ctx_len=256, n_shards=16)
    plan = _executed_plan(q)
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle, on shard
    assert "rangepartitioning" not in plan  # global sort would use range exchange
    # the window sort is per-partition: "Sort [...], false, 0" (global=false)
    assert "Sort [shard" in plan
    assert "], false, 0" in "Sort [shard" + plan.split("Sort [shard")[1][:200]


def test_no_forced_broadcast_over_sf_scaling_frames(spark, sf_correct):
    """The r2 verdict's anti-pattern class, locked down: frames that grow
    with SF (a region's customers, a segment's customers, the supplier
    table) must NOT carry a forced broadcast hint — Catalyst/AQE may
    still CHOOSE broadcast while the side is small, but the logical plan
    must leave it the choice. Constant-size dims (nation=25, region=5)
    may keep their hints; a hint whose subtree scans customer/supplier
    is the OOM-at-scale bug."""
    from go_vectorsearch_spark import queries as Q
    from go_vectorsearch_spark.operators.relational import (
        cascade_delete_survivors,
    )

    # operator level: the victim set is caller-sized — never hinted
    victims = spark.range(10).select(F.col("id").alias("k"))
    child = spark.range(100).select(F.col("id").alias("k"))
    out = cascade_delete_survivors(victims, child, "k", "k")
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()

    # registry level: no hint subtree may contain an SF-scaling table.
    # The 3 lines after a ResolvedHint node are its subtree (a Relation,
    # optionally under a Filter/Project) in the pre-order tree print.
    # multi_star_revenue (r5) and join_semi_segment (r11) are demoted
    # out of the registry but keep this scale guard — reference them by
    # function.
    for name, fn in (
        ("cascade_delete_survivors", Q.REGISTRY["cascade_delete_survivors"].fn),
        ("join_semi_segment", Q.q_join_semi_segment),
        ("multi_star_revenue", Q.q_multi_star_revenue),
    ):
        df = fn(spark, sf_correct)
        lp = df._jdf.queryExecution().analyzed().toString()
        for seg in lp.split("ResolvedHint")[1:]:
            subtree = "\n".join(seg.splitlines()[:4])
            for big in ("customer", "supplier", "orders", "lineitem"):
                assert big not in subtree, (
                    f"{name} forces broadcast over SF-scaling {big}"
                )


def test_lsh_bucket_expression_agrees_with_driver_bucket_of(spark):
    """lsh_search buckets the QUERY driver-side (bucket_of) and the
    CORPUS with the codegen expression (lsh_bucket); search correctness
    rests on the two implementations agreeing bit-for-bit. Covers
    boundary shapes: zero vectors (all dots 0 -> bucket 0, strict >),
    negatives, and a dim that is not a power of two."""
    import numpy as np

    from go_vectorsearch_spark.plans import lsh as L
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    dim, n_bits = 17, 12
    vecs = rng.normal(size=(200, dim)).tolist()
    vecs += [[0.0] * dim, [-1.0] * dim, [1e-12] * dim]
    planes = L.rademacher_planes(dim, n_bits=n_bits)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i long, v array<double>"
    )
    got = {
        r["i"]: r["b"]
        for r in df.withColumn("b", L.lsh_bucket(F.col("v"), planes)).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == L.bucket_of(v, planes), i


def test_lsh_multiprobe_radius_two(spark):
    """Radius-2 probing: the probe set is exactly the Hamming<=2 ball
    (1 + n + C(n,2) buckets), recall is monotone in radius, and
    radius 3 stays a real error."""
    import numpy as np
    import pytest

    from go_vectorsearch_spark.plans import lsh as L
    from pyspark.sql import functions as F

    n_bits = 6
    ball = L._hamming_neighbors(0b101010, n_bits, 2)
    assert len(ball) == 1 + n_bits + n_bits * (n_bits - 1) // 2
    assert len(set(ball)) == len(ball)
    assert all(bin(b ^ 0b101010).count("1") <= 2 for b in ball)

    with pytest.raises(ValueError, match="max 2"):
        L._hamming_neighbors(0, n_bits, 3)

    # recall vs brute force is monotone in probe radius
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(300, 12)).tolist()
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    q = vecs[0]
    planes = L.rademacher_planes(12, n_bits=n_bits)

    def ids(radius):
        res = L.lsh_search(emb, q, k=10, probe_radius=radius, planes=planes)
        return {r["vec_id"] for r in res.collect()}

    from go_vectorsearch_spark.operators.search import brute_force_topk

    bf = {r["vec_id"] for r in brute_force_topk(emb, q, 10).collect()}
    r0, r1, r2 = (len(ids(r) & bf) for r in (0, 1, 2))
    assert r0 <= r1 <= r2
    # 22-bucket Hamming-2 ball of the 64-bucket space (~34% coverage):
    # high recall here comes from near neighbors CONCENTRATING in
    # Hamming-near buckets (the SRP property), not exhaustive coverage —
    # the seeded data keeps this comfortably above the bound
    assert r2 >= 8
