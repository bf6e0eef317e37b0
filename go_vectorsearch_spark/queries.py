"""Named query registry - the driver-checked operator surface.

Every operator from SURVEY.md §2 lands here as a named query with:
  * ``fn(spark, sf_dir) -> DataFrame``   (the Spark-first implementation)
  * ``oracle`` - equivalent ANSI SQL for the DuckDB oracle, or None for
    genuinely non-SQL-expressible ops (driver then records a weaker
    rows-only check).

Conventions that make the driver's order-insensitive value-hash match:
  * every computed column is aliased identically on both sides;
  * float results are computed in double precision with deterministic
    (index-order) summation and rounded to 6 decimals on both sides;
  * every LIMIT has a total-order ORDER BY (unique tie-break column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.relational import (
    cascade_delete_survivors,
    dedup_best_by_key,
    hash_sample,
    lookup_by_keys,
    paginate,
    point_lookup,
)
from go_vectorsearch_spark.operators.search import brute_force_topk
from go_vectorsearch_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Loaded-table plan cache: spark.read.parquet re-reads the footer and
# re-infers the schema on every call (~30-80 ms); 55 registry queries ×
# several tables each adds whole seconds of pure metadata work. A
# DataFrame is an immutable logical plan, so reusing it is free. The
# cache lives ON the session object (not in a module dict keyed by
# id(spark)): its lifetime is then exactly the session's — a new session
# at a recycled address can't inherit a dead session's plans, and
# stopped sessions' entries are garbage-collected with the session.


def _session_cache(spark: SparkSession, attr: str) -> dict:
    """The one definition of the session-attached cache idiom (used for
    table plans, the IVF index, and dedup frames)."""
    cache = getattr(spark, attr, None)
    if cache is None:
        cache = {}
        setattr(spark, attr, cache)
    return cache


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cache = _session_cache(spark, "_gvs_table_cache")
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = load_table(spark, sf_dir, name)
    return cache[key]


# The deterministic query vector (stored embedding of vec_id 0) is fetched
# by every search-family query; one driver-side row per sf_dir, cached so
# the registry doesn't pay a head() job per query (a real service embeds
# the query once per request, not once per operator). SESSION-attached
# like every other cache here (see _session_cache): a module dict keyed
# by sf_dir would serve a new session stale values after the fixture
# parquet at that path is regenerated.


def _qvec(spark: SparkSession, sf_dir: str) -> list:
    cache = _session_cache(spark, "_gvs_qvec_cache")
    if sf_dir not in cache:
        emb = _t(spark, sf_dir, "embeddings")
        cache[sf_dir] = list(
            emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        )
    return cache[sf_dir]

# Brute-force top-k ids for the recall diagnostics — computed once per
# sf_dir (the three recall queries all compare against the same exact
# baseline; recomputing it per query was pure bench overhead).


def _bf_ids(spark: SparkSession, sf_dir: str, k: int) -> frozenset:
    cache = _session_cache(spark, "_gvs_bf_cache")
    key = (sf_dir, k)
    if key not in cache:
        emb = _t(spark, sf_dir, "embeddings")
        cache[key] = frozenset(
            r["vec_id"]
            for r in brute_force_topk(emb, _qvec(spark, sf_dir), k).collect()
        )
    return cache[key]


def _per_tier_topk(scored: DataFrame, tier_col: str, k: int) -> DataFrame:
    """Per-tier top-k for the recall diagnostics, with brute_force_topk's
    EXACT total order (round-6 score desc, vec_id asc — vec_id unique).

    Scale shape (the r10 verdict's one perf-weak flag): a ``row_number``
    window partitioned by a handful of tier values LOOKS like it lands
    the largest tier's entire membership in one sort task — but because
    the rank filter sits directly on the window, Catalyst's
    InferWindowGroupLimit rewrite (Spark ≥3.5) inserts a map-side
    ``WindowGroupLimit … Partial`` BELOW the exchange: every scan task
    locally prunes to ≤ k rows per tier before any shuffle, so the
    final per-tier sort ranks ≤ k × input-partitions rows, never the
    corpus — the distributed-TakeOrdered shape with a single small
    shuffle (a hand-written two-level window adds a second exchange
    for nothing). The rewrite's preconditions (rank-function window,
    literal limit predicate adjacent to it) are easy to break in a
    refactor, so the Partial node's presence is PINNED by
    tests/test_plan_lint.py::test_per_tier_topk_map_side_prune."""
    from pyspark.sql import Window

    w = Window.partitionBy(tier_col).orderBy(
        F.desc(F.round("score", 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(tier_col, "vec_id", F.round("score", 6).alias("score"))
    )



# ---------------------------------------------------------------------------
# Flagship: brute-force cosine top-k search (SURVEY.md §2.3 J4 + §2.5 T2).
# Reference: server/search.go:234-273 - score every embedding against the
# query, dedup by document keeping the best score, keep top-k.
# Query vector = the stored embedding of vec_id 0 (deterministic).
# ---------------------------------------------------------------------------

TOPK_K = 10

# Brute-force cosine top-k SQL — the oracle for cosine_topk AND for
# ann_pca_exact (an uncentered k=d PCA rotation preserves the cosine
# order exactly, so both entries must hash-match this same result).
COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS score
FROM embeddings e, q
ORDER BY score DESC, e.vec_id ASC
LIMIT {TOPK_K}
"""


@register(
    "cosine_topk",
    oracle=COSINE_TOPK_ORACLE,
    doc="J4/T2 brute-force cosine top-k (reference server/search.go:234-273)",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread here (r14, measured): the single scoring fold feeds a
    # map-side-pruning top-k, so at this SF the round-robin exchange
    # costs more than the 1-task fold it parallelizes (min-of-3 A/B:
    # 0.68 vs 0.49 s), and at real scale the scan has thousands of
    # splits and spread() is a no-op — no winner at any scale
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    topk = brute_force_topk(emb, qvec, TOPK_K, id_col="vec_id", vec_col="embedding")
    return topk.select("vec_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Phase B: relational operator coverage (SURVEY.md §2.1-2.6) over the
# TPC-H-ish tables. Each is the Spark-first form of a reference dataflow
# stage; oracles are plain ANSI SQL.
# ---------------------------------------------------------------------------


@register(
    "scan_projection",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01'
""",
    doc="S1/S2/F1 projected+filtered scan; Catalyst pushes both into parquet "
    "(reference: dnc/dnc.go:97 hand-written SELECT)",
)
def q_scan_projection(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def q_point_lookup(spark, sf_dir):
    """S3 single-row lookup by unique name (reference:
    server/search.go:149-168). Demoted out of the 50-entry driver
    window r12 after 11 green rounds (slot ceded to the
    boilerplate_cut_docs fixpoint oracle); the identical parity bar
    lives in tests/test_demoted_parity.py via POINT_LOOKUP_ORACLE."""
    cust = _t(spark, sf_dir, "customer")
    return point_lookup(cust, "c_name", "Customer#000000042").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


POINT_LOOKUP_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_name = 'Customer#000000042' LIMIT 1
"""


# S4/F2 multi-row lookup by PK list (reference: server/search.go:291).
# Demoted out of the 50-entry driver window (slot ceded to
# text_repetition); the identical parity bar lives in
# tests/test_demoted_parity.py. point_lookup keeps S3 oracle-checked.
LOOKUP_IN_LIST_ORACLE = """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_partkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
"""


def q_lookup_in_list(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return lookup_by_keys(part, "p_partkey", [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]).select(
        "p_partkey", "p_name", "p_retailprice"
    )


@register(
    "join_fk_filter",
    oracle="""
SELECT e.vec_id, e.label, d.source
FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
WHERE d.lang = 'en'
""",
    doc="J1/F3 embeddings-documents FK join with pushed filter "
    "(reference: dnc/dnc.go:40-42,95-97)",
)
def q_join_fk_filter(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    return (
        emb.join(docs, emb.vec_id == docs.doc_id)
        .filter(F.col("lang") == "en")
        .select("vec_id", "label", "source")
    )


# Demoted (r11) to tests/test_demoted_parity.py — ceded its window slot
# to line_dedup_docs (the r10-added boilerplate-line dedup family's full
# DuckDB oracle, which had never been driver-proved). J3 semi-join
# semantics keep the identical parity bar there; the shape stays
# driver-proved in-window via cascade_delete_survivors' anti-join twin.
JOIN_SEMI_SEGMENT_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def q_join_semi_segment(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    # no broadcast hint: the segment's customer set scales with SF;
    # AQE broadcasts it only while it is actually small
    return orders.join(keys, "o_custkey", "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


# Demoted (r11) to tests/test_demoted_parity.py — ceded its window slot
# to pipeline_curate_docs (the end-to-end pretraining-curation
# composition's full DuckDB oracle). A1 count-with-join-filter keeps the
# identical parity bar there; the join+filter+agg shape stays
# driver-proved in-window via join_fk_filter and groupby_count.
AGG_COUNT_JOIN_ORACLE = """
SELECT count(*) AS n
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
"""


def q_agg_count_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("n"))
    )


@register(
    "groupby_count",
    oracle="SELECT label, count(*) AS n FROM embeddings GROUP BY label",
    doc="A2 group-count: embeddings per centroid-like label "
    "(reference: dnc/dnc.go:464-471)",
)
def q_groupby_count(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(F.count("*").alias("n"))


# A-extension TPC-H-Q1-style pricing summary: multi-agg with map-side
# partial aggregation. Demoted (r5) from the driver window to
# tests/test_demoted_parity.py — same DuckDB-parity bar — to make room
# for the round-4 fulltext/filtered-search/quality-model entries.
AGG_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(avg(l_quantity), 6)                                   AS avg_qty,
       round(avg(l_discount), 6)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# T2/D1 deduped top-k: best order per customer, then global top-10
# (reference: server/search.go:234-273 dedup-by-document top-k).
# Demoted out of the 50-entry driver window r13 after 12 green rounds
# (slot ceded to the dedup_semantic greedy-elimination oracle); the
# identical parity bar lives in tests/test_demoted_parity.py, and T2
# deduped-top-k stays driver-proved via the in-window cosine_topk.
TOPK_DEDUP_CUSTOMER_ORACLE = """
SELECT o_custkey, round(max(o_totalprice), 2) AS best_price
FROM orders GROUP BY o_custkey
ORDER BY best_price DESC, o_custkey ASC LIMIT 10
"""


def q_topk_dedup_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    best = dedup_best_by_key(orders, "o_custkey", "o_totalprice")
    return (
        best.select("o_custkey", F.round("o_totalprice", 2).alias("best_price"))
        .orderBy(F.desc("best_price"), F.asc("o_custkey"))
        .limit(10)
    )


# Demoted (r10) to tests/test_demoted_parity.py — ceded its window slot
# to decontaminate_cut_docs (the benchmark-cut write path's full oracle,
# the span family's last driver-unproved member). T3 pagination has been
# green since round 1; the parity bar is unchanged there.
PAGINATION_ORDERS_ORACLE = """
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS _rn
  FROM orders
) WHERE _rn > 10 AND _rn <= 20
"""


def q_pagination_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    # limit upstream first so the single-partition window sort is tiny
    top = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20)
    return paginate(
        top, [F.desc("o_totalprice"), F.asc("o_orderkey")], count=10, offset=10
    ).select("o_orderkey", "o_totalprice")


@register(
    "cascade_delete_survivors",
    oracle="""
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_custkey NOT IN (
  SELECT c_custkey FROM customer
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA')
GROUP BY o_orderstatus
""",
    doc="S8 cascade delete as top-down anti-join: delete region ASIA => "
    "surviving orders (reference: server/delete.go:214-288 + FK cascades)",
)
def q_cascade_delete_survivors(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    victim_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    victim_custs = cust.join(
        F.broadcast(victim_nations), cust.c_nationkey == victim_nations.n_nationkey, "left_semi"
    )
    # c_custkey is the customer PK — the victim set is already unique,
    # so the operator's dedup exchange is skipped (r13, guide §2.4)
    survivors = cascade_delete_survivors(
        victim_custs, orders, "o_custkey", "c_custkey", parent_key_unique=True
    )
    return survivors.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


# C1/D2 deterministic engine-portable hash-sample replacing the
# reference's wall-clock Fisher-Yates (dnc/sampling.go:81-96).
# Demoted (r5) to tests/test_demoted_parity.py.
HASH_SAMPLE_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = 'a'
"""


def q_hash_sample_customers(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return hash_sample(cust, "c_custkey", "a").select("c_custkey", "c_name")


# Window extension: per-supplier running revenue (deterministic
# sequential accumulation, identical order both engines).
# Demoted (r5) to tests/test_demoted_parity.py.
WINDOW_RUNNING_REVENUE_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS UNBOUNDED PRECEDING), 2) AS running_rev
FROM lineitem WHERE l_suppkey < 3
"""


def q_window_running_revenue(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 3)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
    )


# Event-time extension: tumbling 1h window aggregate (batch twin of
# the Structured Streaming operator in streaming/events.py).
# Demoted (r5) to tests/test_demoted_parity.py.
EVENTS_TUMBLING_HOUR_ORACLE = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_tumbling_hour(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# Demoted (r6) to tests/test_demoted_parity.py — ceded its window slot
# to the r5 pipeline operators (cdc/bpe/ngram/token-budget).
EVENTS_SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(1 + sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM gaps GROUP BY user_id
"""


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w) > 1800.0,
            1,
        ).otherwise(0),
    )
    return gaps.groupBy("user_id").agg(
        (1 + F.sum("new_session")).cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# Range join (custom operator Spark lacks, like asof_join): per promo
# window [o_orderdate, +7d] of every 1000th order, count lineitems
# shipped inside it. Bucketed-equi-join shape — a raw BETWEEN join
# plans a nested-loop cross product (operators/relational.
# range_join_point; plan shape pytest-asserted). Demoted parity bar.
RANGE_JOIN_SHIPMENTS_ORACLE = """
WITH w AS (
  SELECT o_orderkey, o_orderdate AS win_start,
         o_orderdate + INTERVAL 7 DAY AS win_end
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT w.o_orderkey, count(*) AS n_shipped,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM w JOIN lineitem l
  ON l.l_shipdate >= w.win_start AND l.l_shipdate <= w.win_end
GROUP BY w.o_orderkey
"""


def q_range_join_shipments(spark, sf_dir):
    from go_vectorsearch_spark.operators.relational import range_join_point

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    windows = orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        "o_orderkey",
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("win_end"),
    )
    joined = range_join_point(
        li.select("l_shipdate", "l_quantity"),
        windows,
        point_col="l_shipdate",
        start_col="win_start",
        end_col="win_end",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_shipped"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# Hypertable-style time-hierarchy rollup: one pass emits hourly,
# daily, and grand-total event aggregates via ROLLUP (Expand + single
# partial-agg shuffle — the batch form of a continuous aggregate; the
# streaming twin is streaming/events.tumbling_counts). Demoted parity.
EVENTS_ROLLUP_TIME_ORACLE = """
SELECT CAST(grouping(date_trunc('day', ts)) * 2
          + grouping(date_trunc('hour', ts)) AS INT) AS lvl,
       CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
       CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
"""


def q_events_rollup_time(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    hour = F.date_trunc("hour", F.col("ts").cast("timestamp"))
    return (
        ev.rollup(day.alias("_day"), hour.alias("_hour"))
        .agg(
            # grouping_id over (day, hour): 0 = hourly cell, 1 = daily
            # subtotal, 3 = grand total — same encoding both engines.
            # (must be computed INSIDE the agg: it reads the Expand
            # node's grouping bitmap)
            F.grouping_id().cast("int").alias("lvl"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "lvl",
            F.unix_micros(F.col("_day")).alias("day_us"),
            F.unix_micros(F.col("_hour")).alias("hour_us"),
            "n",
            "sum_value",
        )
    )


# X4 JSON payload decode at query time over the events.props column
# (reference: database/type.go:14-17 DocumentField.JSON). Demoted to the
# pytest-parity bar (tests/test_demoted_parity.py) — the 50-entry driver
# window is full; doc_flatten_struct keeps X4 oracle-checked on the
# documents table, this pins the events-side path extraction.
EVENTS_JSON_EXTRACT_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
       count(*) AS n
FROM events
WHERE CAST(props->>'k' AS BIGINT) > 50
GROUP BY event_type
"""


def q_events_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("_k", k)
        .filter(F.col("_k") > 50)
        .groupBy("event_type")
        .agg(F.sum("_k").alias("k_sum"), F.count("*").alias("n"))
    )


@register(
    "events_asof_join",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_r
  FROM events WHERE event_type IN ('signup', 'purchase')
), w AS (
  SELECT user_id, ts, event_id, is_r,
         max(CASE WHEN is_r = 1 THEN ts END) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_r DESC, event_id ASC
           ROWS UNBOUNDED PRECEDING) AS asof_ts,
         last_value(CASE WHEN is_r = 1 THEN value END IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_r DESC, event_id ASC
           ROWS UNBOUNDED PRECEDING) AS asof_value
  FROM u
)
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(epoch_us(asof_ts) AS BIGINT) AS asof_ts_us,
       round(asof_value, 4) AS asof_value
FROM w WHERE is_r = 0
""",
    doc="As-of join (custom operator Spark lacks): each purchase matched "
    "to the user's most recent at-or-before signup via the tag + "
    "running-last-value shape - ONE scan of the log, one shuffle, no "
    "range-join explosion (operators/relational.asof_join_same_source; "
    "the two-frame form asof_join shares the window core and is "
    "equivalence-tested against this in tests/test_relational_ops.py)",
)
def q_events_asof_join(spark, sf_dir):
    from go_vectorsearch_spark.operators.relational import asof_join_same_source

    ev = _t(spark, sf_dir, "events")
    joined = asof_join_same_source(
        ev.select("event_id", "user_id", "ts", "value", "event_type"),
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "signup",
        on="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["value"],
        tie_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The
        # session tz is pinned to UTC, so the cast reads the naive
        # wall-clock as UTC - exactly DuckDB's epoch_us on naive ts.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("asof_ts").cast("timestamp")).alias("asof_ts_us"),
        F.round("asof_value", 4).alias("asof_value"),
    )


# Multi-distinct aggregation (expand-based partial aggregation; absent
# from the reference, SURVEY.md §2.4 note).
# Demoted (r5) to tests/test_demoted_parity.py.
AGG_COUNT_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_count_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n"),
    )


# TPC-H-Q5-style star join: broadcast dims, single shuffle on the fact
# table. Demoted (r5) to tests/test_demoted_parity.py.
MULTI_STAR_REVENUE_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""


def q_multi_star_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # supplier scales with SF (10k rows per SF=1) — no forced
        # broadcast; nation/region below are constant-size (25/5 rows)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --- demoted to pytest parity (tests/test_demoted_parity.py) ---------------
# The driver's CORRECTNESS gate checks only the first 50 registry entries
# (round-1 finding); these three relational/window extensions gave up
# their slots to the curation family (pii_redact / decontaminate_docs /
# sample_stratified) and keep full DuckDB-parity coverage in pytest.

PIVOT_STATUS_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
"""


def q_pivot_status_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
    )


SLIDING_QUARTER_ORACLE = """
SELECT CAST(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - k * 900 AS BIGINT) AS win_start_epoch,
       event_type, count(*) AS n
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
GROUP BY 1, 2
"""


def q_events_sliding_quarter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_epoch"),
            "event_type",
            "n",
        )
    )


ROLLUP_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_rollup_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


CUBE_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_cube_pricing(spark, sf_dir):
    """CUBE completes the grouping-set family next to rollup/pivot. Same
    scale shape as a plain groupBy: Spark expands the grouping sets
    map-side (each input row feeds its 4 combinations into the partial
    agg), one shuffle of |groups| rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


VOCAB_TOP_TERMS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
)
SELECT term, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM toks WHERE term <> ''
GROUP BY term
ORDER BY n_total DESC, term ASC
LIMIT 100
"""


def q_vocab_top_terms(spark, sf_dir):
    """Vocabulary construction — the first pass of any tokenizer/BPE
    training run: term -> (corpus frequency, document frequency), top
    100. Scale shape: explode + ONE groupBy(term) with map-side partial
    aggregation (stopword skew collapses map-side; count-distinct
    expands to a two-phase agg), TakeOrdered for the cut. The explode
    never shuffles raw text — only (term, doc_id) pairs."""
    from go_vectorsearch_spark.functions.text import ws_tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("term"))
        .limit(100)
    )


# Exact kNN graph (operators/dedup.knn_graph_exact): the substrate of
# graph-based curation, pinned against an exhaustive SQL kNN with the
# same (round(cosine, 6) desc, dst asc) ranking. pytest-parity (the
# 50-entry driver window is full); knn_graph (LSH-bucketed) calibrates
# its recall against this in tests/test_dedup_text.py.
KNN_GRAPH_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(
           list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))),
           6) AS cosine
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT src, dst, cosine
FROM (SELECT src, dst, cosine,
             row_number() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


def q_knn_graph_exact(spark, sf_dir):
    from go_vectorsearch_spark.operators.dedup import knn_graph_exact

    g = knn_graph_exact(_t(spark, sf_dir, "embeddings"), k=5)
    return g.select("src", "dst", F.round("cosine", 6).alias("cosine"))


# Embedding-side data validation — the vector twin of the registry's
# validate_documents: one aggregate pass asserting the invariants every
# ANN/quantization operator in the engine assumes (uniform dimension,
# no NULL vectors, no NaN elements, no all-zero vectors). pytest-parity
# (the 50-entry driver window is full).
# Degenerate-input semantics, pinned identically on BOTH engines (the
# rows this validator exists to catch): a NULL element never hides a
# row (counted in null_element_vectors; the zero test folds over the
# NON-null elements — DuckDB's list_sum skips NULL products, Spark
# filters first); an EMPTY or all-NULL-element vector counts as zero
# (no signal — Spark folds to 0.0, DuckDB's NULL list_sum coalesces to
# 0); a NULL vector counts ONLY as null_vectors.
# tests/test_demoted_parity.py re-checks parity on planted dirty rows.
VALIDATE_EMBEDDINGS_ORACLE = """
SELECT count(*) AS n_rows,
       count(DISTINCT len(embedding)) AS n_distinct_dims,
       count(*) FILTER (WHERE embedding IS NULL) AS null_vectors,
       count(*) FILTER (
         WHERE len(list_filter(embedding, x -> x IS NULL)) > 0
       ) AS null_element_vectors,
       count(*) FILTER (
         WHERE len(list_filter(embedding, x -> isnan(x::DOUBLE))) > 0
       ) AS nan_vectors,
       count(*) FILTER (
         WHERE embedding IS NOT NULL
           AND coalesce(list_sum(list_transform(embedding, x -> abs(x::DOUBLE))), 0) = 0
       ) AS zero_vectors
FROM embeddings
"""


def q_validate_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    abs_sum = F.aggregate(
        F.filter(v, lambda x: x.isNotNull()),
        F.lit(0.0),
        lambda a, x: a + F.abs(x.cast("double")),
    )
    return emb.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.size(v)).alias("n_distinct_dims"),
        F.count_if(v.isNull()).alias("null_vectors"),
        F.count_if(F.exists(v, lambda x: x.isNull())).alias(
            "null_element_vectors"
        ),
        F.count_if(
            F.exists(v, lambda x: F.isnan(x.cast("double")))
        ).alias("nan_vectors"),
        F.count_if(abs_sum == 0.0).alias("zero_vectors"),
    )


# Deterministic holdout split (operators/curation.train_val_test_split):
# content-addressed hash buckets against cumulative fraction thresholds,
# so the same row lands in the same split on any cluster/rerun/engine.
# pytest-parity (the 50-entry driver window is full).
TRAIN_VAL_TEST_ORACLE = r"""
SELECT doc_id,
       CASE
         WHEN CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 9800 THEN 'train'
         WHEN CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 9900 THEN 'val'
         ELSE 'test'
       END AS split
FROM documents
"""


def q_train_val_test_split(spark, sf_dir):
    from go_vectorsearch_spark.operators.curation import train_val_test_split

    return train_val_test_split(_t(spark, sf_dir, "documents")).select(
        "doc_id", "split"
    )


SHARD_MANIFEST_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS shard,
         len(regexp_split_to_array(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars
  FROM documents
)
SELECT shard, count(*) AS n_docs, sum(n_tokens) AS total_tokens, sum(n_chars) AS total_chars
FROM t GROUP BY shard ORDER BY shard
"""


def q_shard_manifest(spark, sf_dir):
    from go_vectorsearch_spark.operators.curation import shard_manifest

    return shard_manifest(_t(spark, sf_dir, "documents"), n_shards=32)


# Sequence packing (operators/curation.pack_sequences): GPT-style
# concat-and-chunk over per-shard token streams. pytest-parity (the
# 50-entry driver window is full); same DuckDB bar as the registry.
PACK_SEQUENCES_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
         CAST(concat('0x', substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, h % 16 AS shard,
         sum(n_tokens) OVER (PARTITION BY h % 16 ORDER BY h ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
  FROM t
)
SELECT doc_id, shard, n_tokens,
       shard * 4294967296 + CAST(floor(strt / 256.0) AS BIGINT) AS pack_id,
       CAST(strt - CAST(floor(strt / 256.0) AS BIGINT) * 256 AS BIGINT) AS pack_offset
FROM s
"""


def q_pack_sequences(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.size(T.ws_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return CUR.pack_sequences(staged, ctx_len=256, n_shards=16)


# Weighted dataset mixing with oversampling (operators/curation.
# weighted_mix): per-stratum weights may exceed 1.0 — w = k + f emits k
# deterministic full copies + a content-addressed f-fraction extra.
# pytest-parity (the 50-entry driver window is full).
WEIGHTED_MIX_ORACLE = """
WITH w AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'zh' THEN 2.25 ELSE 1.0 END AS wt,
         (CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)) % 10000 AS h
  FROM documents
), n AS (
  SELECT doc_id, lang,
         CAST(floor(wt) AS BIGINT)
         + CASE WHEN h < round((wt - floor(wt)) * 10000) THEN 1 ELSE 0 END AS n_copies
  FROM w
)
SELECT doc_id, lang, gs.c AS _copy
FROM n JOIN LATERAL (SELECT unnest(generate_series(1, n.n_copies)) AS c) gs ON TRUE
WHERE n_copies > 0
"""


def q_weighted_mix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    mixed = CUR.weighted_mix(
        docs, "lang", {"en": 0.5, "zh": 2.25}, default_weight=1.0, id_col="doc_id"
    )
    return mixed.select("doc_id", "lang", "_copy")


# Table profiling (operators/profiling.profile_columns): the first step a
# pipeline runs on a new corpus drop — per-column nulls / cardinality /
# range / length stats in ONE scan of mergeable aggregates. pytest-parity
# (the 50-entry driver window is full); exact_distinct mode here because
# HLL estimates are engine-specific while exact counts are not.
def _profile_col_oracle(col: str, dtype: str, numeric: bool) -> str:
    mean = f"avg({col})::DOUBLE" if numeric else "CAST(NULL AS DOUBLE)"
    alen = (
        f"avg(length({col}))::DOUBLE" if dtype == "string" else "CAST(NULL AS DOUBLE)"
    )
    return f"""
SELECT '{col}' AS "column", '{dtype}' AS dtype,
       count(*) AS n_rows,
       count(*) FILTER (WHERE {col} IS NULL) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS min_value,
       CAST(max({col}) AS VARCHAR) AS max_value,
       {mean} AS mean, {alen} AS avg_len
FROM documents"""


PROFILE_DOCUMENTS_ORACLE = " UNION ALL ".join(
    _profile_col_oracle(c, t, n)
    for c, t, n in [
        ("doc_id", "bigint", True),
        ("text", "string", False),
        ("lang", "string", False),
        ("source", "string", False),
        ("n_chars", "bigint", True),
    ]
)


def q_profile_documents(spark, sf_dir):
    from go_vectorsearch_spark.operators.profiling import profile_columns

    docs = _t(spark, sf_dir, "documents")
    return profile_columns(docs, exact_distinct=True)


def q_profile_documents_approx(spark, sf_dir):
    """The corpus-scale mode: HLL distinct sketches keep the whole
    profile one aggregate pair (no Expand, no per-column shuffles) —
    this is the plan PLANS.md documents; the exact twin above is the
    engine-parity mode."""
    from go_vectorsearch_spark.operators.profiling import profile_columns

    return profile_columns(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Phase C: vector column toolkit (SURVEY.md §2.7 V1-V5, §2.4 A3-A5).
# The f32 reference-parity path is pytest-checked against a numpy golden
# (tests/test_vector_kernels.py); these oracle queries run the same
# formulas in float64 so DuckDB can reproduce them bit-for-bit.
# ---------------------------------------------------------------------------


@register(
    "normalize_norms",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS norm,
       round(CASE WHEN sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) = 0 THEN 0.0
             ELSE embedding[1]::DOUBLE / sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) END,
             6) AS first_normed
FROM embeddings
""",
    doc="V1 L2 norm + normalize, zero-safe (reference: compute/cosine.go:138-149)",
)
def q_normalize_norms(spark, sf_dir):
    from go_vectorsearch_spark.functions.vector import l2_norm, l2_normalize
    from go_vectorsearch_spark.sources.tables import spread

    # spread: single-split input serialized the per-row HOF norm fold
    # on one core (see q_cosine_topk) — row-level math is unchanged
    emb = spread(_t(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 6).alias("norm"),
        F.round(F.element_at(l2_normalize(F.col("embedding")), 1), 6).alias("first_normed"),
    )


@register(
    "quantize_roundtrip",
    oracle="""
WITH rng AS (
  SELECT vec_id, embedding,
         CAST(CAST(least(list_min(embedding), 0) AS REAL) AS DOUBLE) AS lo,
         CAST(CAST(greatest(list_max(embedding), 0) AS REAL) AS DOUBLE) AS hi
  FROM embeddings
), q AS (
  SELECT vec_id, embedding, lo, hi,
         CASE WHEN hi - lo = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                     x -> CAST(floor((least(greatest(x::DOUBLE, lo), hi) - lo) / (hi - lo) * 255) AS INTEGER))
         END AS codes
  FROM rng
)
SELECT vec_id,
       CAST(list_sum(codes) AS BIGINT) AS q_sum,
       round(list_max(list_transform(generate_series(1, len(embedding)),
             i -> abs(embedding[i]::DOUBLE - (lo + codes[i] / 255.0 * (hi - lo))))), 6) AS max_err
FROM q
""",
    doc="V4/V5/A4 scalar quantize + dequantize round-trip with the "
    "reference's clamp/0-anchored-range/truncate semantics "
    "(compute/quantization.go:8-19,47-53,182-192), float64 oracle mode",
)
def q_quantize_roundtrip(spark, sf_dir):
    from go_vectorsearch_spark.functions.vector import dequantize, quantize, vector_range
    from go_vectorsearch_spark.sources.tables import spread

    # spread: quantize+dequantize+fold per row on a one-split scan (see
    # q_cosine_topk) — per-row math unchanged
    emb = spread(_t(spark, sf_dir, "embeddings"))
    lo, hi = vector_range(F.col("embedding"))
    withq = emb.withColumn("lo", lo).withColumn("hi", hi).withColumn(
        "codes", quantize(F.col("embedding"), F.col("lo"), F.col("hi"), "float64")
    )
    dq = dequantize(F.col("codes"), F.col("lo"), F.col("hi"), "float64")
    return withq.select(
        "vec_id",
        F.aggregate(F.col("codes"), F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.round(
            F.array_max(
                F.zip_with(F.col("embedding"), dq, lambda x, d: F.abs(x.cast("double") - d))
            ),
            6,
        ).alias("max_err"),
    )


@register(
    "vector_mean_by_label",
    oracle="""
SELECT label, i - 1 AS pos, round(avg(e), 6) AS m
FROM (SELECT label, unnest(embedding)::DOUBLE AS e, generate_subscripts(embedding, 1) AS i
      FROM embeddings)
GROUP BY label, i
""",
    doc="A3 grouped elementwise vector mean via posexplode partial agg "
    "(reference: dnc/dnc.go:416-455, k_means.go:80-96)",
)
def q_vector_mean_by_label(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
        .select("label", F.col("pos").cast("long").alias("pos"), "m")
    )


@register(
    "centroid_assign",
    oracle="""
WITH means AS (
  SELECT label, i, avg(e) AS m
  FROM (SELECT label, unnest(embedding)::DOUBLE AS e, generate_subscripts(embedding, 1) AS i
        FROM embeddings)
  GROUP BY label, i
), cent AS (
  SELECT label AS c_label, list(m ORDER BY i) AS cvec FROM means GROUP BY label
), sims AS (
  SELECT e.vec_id, c.c_label,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 j -> e.embedding[j]::DOUBLE * c.cvec[j]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(c.cvec, x -> x * x)))) AS sim
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, CAST(c_label AS BIGINT) AS assigned_id
FROM (SELECT vec_id, c_label,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label ASC) AS rn
      FROM sims)
WHERE rn = 1
""",
    doc="J5/A5/V3 nearest-centroid argmax assignment against broadcast "
    "centroids, first-max tie-break (reference: compute/cosine.go:70-125, "
    "dnc/dnc.go:199-221)",
)
def q_centroid_assign(spark, sf_dir):
    from go_vectorsearch_spark.functions.vector import vector_mean
    from go_vectorsearch_spark.operators.assign import assign_nearest
    from go_vectorsearch_spark.sources.tables import spread

    emb = spread(_t(spark, sf_dir, "embeddings"))
    centroids = vector_mean(emb, ["label"], "embedding", out_col="centroid_vec").select(
        F.col("label").alias("centroid_id"), "centroid_vec"
    )
    assigned = assign_nearest(emb, centroids, vec_col="embedding", out_col="assigned_id")
    return assigned.select("vec_id", "assigned_id")


# ---------------------------------------------------------------------------
# Phase D: IVF-Flat index pipeline (SURVEY.md §2.8). Search with
# nprobe = |centroids| is EXACTLY brute force whatever k-means produced,
# so it gets the brute-force SQL oracle; build statistics are
# k-means-dependent and get the weaker rows-only check.
# ---------------------------------------------------------------------------


def _ivf_index(spark, sf_dir):
    """Build (once per sf_dir) the IVF index both IVF queries share -
    index reuse across queries is exactly how the engine is meant to be
    operated (build in the background, search many times,
    reference: server/centroids.go:17-83). Session-attached cache like
    _t/_dedup_cached: persisted frames die with their session."""
    cache = _session_cache(spark, "_gvs_ivf_cache")
    if sf_dir not in cache:
        from go_vectorsearch_spark.plans.ivf import build_index

        from pyspark import StorageLevel

        emb = _t(spark, sf_dir, "embeddings")
        cache[sf_dir] = build_index(emb, max_leaf=100, sample_size=5000)
        # DESER level: skip the columnar re-encode (see _dedup_cached)
        cache[sf_dir].assigned.persist(StorageLevel.MEMORY_AND_DISK_DESER).count()
        # centroids are k tiny rows but a LAZY recenter plan: every
        # search collects them (nearest_centroids), so materialize once
        # here — unpersisted, each consumer re-runs the recenter job;
        # the count doubles as the cached nprobe=all value (below)
        cache[("n", sf_dir)] = cache[sf_dir].centroids.persist().count()
    return cache[sf_dir]


def _ivf_nprobe_all(spark, sf_dir) -> int:
    """|centroids| for the nprobe=all parity searches — cached at index
    build; a count() job per search for a number the build already knew
    was pure scheduling latency."""
    cache = _session_cache(spark, "_gvs_ivf_cache")
    _ivf_index(spark, sf_dir)
    return cache[("n", sf_dir)]


@register(
    "ivf_search_exact",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS score
FROM embeddings e, q
ORDER BY score DESC, e.vec_id ASC
LIMIT {TOPK_K}
""",
    doc="C5+T1+J4 full IVF pipeline, nprobe=all parity case: build index, "
    "probe every partition -> must equal brute force exactly "
    "(reference: server/search.go:118-122, negative centroids => all)",
)
def q_ivf_search_exact(spark, sf_dir):
    from go_vectorsearch_spark.plans.ivf import ivf_search

    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    index = _ivf_index(spark, sf_dir)
    nprobe = _ivf_nprobe_all(spark, sf_dir)
    res = ivf_search(index, qvec, k=TOPK_K, nprobe=nprobe)
    return res.select("vec_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Phase E-1: text analysis over `documents` (training-data pipeline ops).
# The SQL oracles are GENERATED from the same constants the Spark
# expressions use (functions/text.py), so the two sides cannot drift.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.functions import text as T  # noqa: E402

_SQL_TOKENS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_SQL_H32 = "CAST(concat('0x', substr(md5({x}), 1, 8)) AS BIGINT)"


_SQL_STOPLIST = ", ".join(f"'{w}'" for w in T.STOPWORDS)


@register(
    "text_quality",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, text, {_SQL_TOKENS} AS toks,
         CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / length(text)::DOUBLE
         ELSE 0.0 END AS ar
  FROM documents
), c AS (
  SELECT doc_id, text, toks, ar,
         len(list_filter(toks, tok -> list_contains([{_SQL_STOPLIST}], tok)))::DOUBLE
           / len(toks)::DOUBLE AS sr,
         list_sum(list_transform(toks, tok -> length(tok)))::DOUBLE
           / len(toks)::DOUBLE AS ml
  FROM t
)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_ws_tokens,
       len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe_tokens,
       round(ar, 6) AS alpha_ratio, round(sr, 6) AS stop_ratio,
       round(ml, 6) AS mean_tok_len,
       round(0.4 * ar + 0.3 * (1.0 - abs(sr - 0.4)) + 0.3 * least(ml / 8.0, 1.0), 6)
         AS quality
FROM c
""",
    doc="Token counting (whitespace + BPE-ish regex) and quality scoring "
    "(alpha ratio, stopword ratio, mean token length, composite score) in "
    "one projection pass — a training pipeline computes all per-doc text "
    "stats in a single scan (functions/text.quality_score, "
    "bpe_token_count)",
)
def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # stage the token array, then the three unrounded ratios, so the
    # quality score reuses them instead of re-tokenizing per component
    # (inlined, the tokenize subtree would run ~5x per row)
    staged = docs.select(
        "doc_id", "text", T.ws_tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        "text",
        "_toks",
        T.alpha_ratio(F.col("text")).alias("_ar"),
        T.stopword_ratio(F.col("_toks")).alias("_sr"),
        T.mean_token_len(F.col("_toks")).alias("_ml"),
    )
    quality = T.quality_score_from_parts(F.col("_ar"), F.col("_sr"), F.col("_ml"))
    return staged.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size("_toks").cast("long").alias("n_ws_tokens"),
        T.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.round("_ar", 6).alias("alpha_ratio"),
        F.round("_sr", 6).alias("stop_ratio"),
        F.round("_ml", 6).alias("mean_tok_len"),
        F.round(quality, 6).alias("quality"),
    )


def _lang_id_oracle() -> str:
    hit_cols = ",\n         ".join(
        "len(list_filter(toks, tok -> list_contains(["
        + ", ".join(f"'{w}'" for w in T.LANG_MARKERS[lang])
        + f"], tok))) AS hits_{lang}"
        for lang in sorted(T.LANG_MARKERS)
    )
    langs = sorted(T.LANG_MARKERS)
    top = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} = {top} THEN '{lang}'" for lang in langs
    ) + " END"
    return rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
h AS (
  SELECT doc_id,
         {hit_cols}
  FROM t
)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in langs)}, {case} AS pred_lang
FROM h
"""


@register(
    "text_lang_id",
    oracle=_lang_id_oracle(),
    doc="Language ID by marker-function-word vote with alphabetical "
    "tie-break (stopword-profile heuristic; functions/text.lang_id)",
)
def q_text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    langs = sorted(T.LANG_MARKERS)
    # stage tokens, then the per-language hit counts: lang_id over an
    # inline token expression re-runs tokenize+filter per reference
    # (~12x per row across the vote CASE chain)
    staged = docs.select(
        "doc_id", T.ws_tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        *[
            T.lang_marker_hits(F.col("_toks"), lang).alias(f"hits_{lang}")
            for lang in langs
        ],
    )
    top = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = None
    for lang in langs:  # alphabetical => first match wins ties
        cond = F.col(f"hits_{lang}") == top
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return staged.select(
        "doc_id", *[f"hits_{lang}" for lang in langs], pred.alias("pred_lang")
    )


# Demoted (r6) to tests/test_demoted_parity.py — ceded its window slot
# to the r5 pipeline operators (cdc/bpe/ngram/token-budget).
TEXT_FINGERPRINT_ORACLE = rf"""
SELECT doc_id,
       list_reduce(list_transform({_SQL_TOKENS},
                                  tok -> {_SQL_H32.format(x='tok')}),
                   (acc, h) -> (acc * {T.FP_BASE} + h) % {T.FP_MOD}) AS fp
FROM documents
"""


def q_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.transform(T.ws_tokens(F.col("text")), T.md5_int32).alias("_codes"),
    )
    return staged.select(
        "doc_id", T.fingerprint_of_codes(F.col("_codes")).alias("fp")
    )


# ---------------------------------------------------------------------------
# Phase E-2: deduplication suite over `documents` / `embeddings`
# (operators/dedup.py). Oracles generated from the same constants.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.operators import dedup as DD  # noqa: E402

# distinct md5_int32-hashed word-3-grams — the oracle twin of
# operators/dedup.shingled_docs: BOTH engines do set arithmetic
# (sizes, intersections, Jaccard) over hashed shingle sets, so results
# are exact-equal by construction, hash collisions included.
_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), "
    f"s -> {_SQL_H32.format(x='s')}))"
)


# Shared, persisted intermediate frames for the dedup family — the
# _ivf_index pattern: shingling / sketching the corpus once and reusing it
# across registry queries is exactly how a real cleaning job runs (one
# pass, many consumers), and it removes the dominant repeated map-side
# cost from the bench.
def _dedup_cached(spark, key: str, sf_dir: str, build, eager: bool = True) -> DataFrame:
    # session-attached like _t's plan cache: persisted frames are bound
    # to their session, so a module-level dict would hand a later
    # session another session's dead frames
    cache = _session_cache(spark, "_gvs_dedup_cache")
    k = (key, sf_dir)
    if k not in cache:
        from pyspark import StorageLevel

        # DESER (row-object) storage: the default MEMORY_AND_DISK level
        # re-encodes into compressed columnar batches — measured ~4x the
        # materialization cost of the frame's own compute for these
        # array-heavy intermediates. They are session-scoped scratch
        # (a deployment would write parquet), so trade memory for the
        # encode time.
        df = build().persist(StorageLevel.MEMORY_AND_DISK_DESER)
        if eager:
            # shared builds materialize eagerly so bench.py bills the
            # compute to the build entry, not to whichever query
            # touches the frame first
            df.count()
        # eager=False: entry-internal frames (the curate chain's) skip
        # the count — their first downstream job materializes the cache
        # while doing real work, saving the count's own job rounds; the
        # per-partition cache locks make the racing-consumer case
        # compute-once either way
        cache[k] = df
    return cache[k]


def _toks_cached(spark, sf_dir):
    """THE corpus tokenize pass (_id, _toks), persisted once and shared
    by every token consumer: the shingle frame, the L-token substring
    window frame, and the decontamination splits all derive from it —
    one raw-text scan + split per corpus instead of one per family
    (bench bills the materialization to ``corpus_tokenize_build``)."""
    return _dedup_cached(
        spark,
        "tokenized",
        sf_dir,
        lambda: DD.tokenized_docs(_t(spark, sf_dir, "documents")),
    )


def _shingled_cached(spark, sf_dir):
    return _dedup_cached(
        spark,
        "shingled",
        sf_dir,
        lambda: DD.shingled_docs(
            _t(spark, sf_dir, "documents"),
            tokenized=_toks_cached(spark, sf_dir),
        ),
    )


def _jaccard_pairs_cached(spark, sf_dir):
    # oracle-parity mode: max_shingle_freq=None, because the DuckDB twin
    # counts every shingle. The capped default stays for production
    # callers; a cap that ever bound here would drop pairs the oracle
    # keeps (the sf0.01/0.1 fixtures have no 1000-doc shingle, asserted
    # in tests/test_dedup_text.py).
    return _dedup_cached(
        spark,
        "jaccard",
        sf_dir,
        lambda: DD.jaccard_pairs(
            _t(spark, sf_dir, "documents"),
            threshold=0.2,
            max_shingle_freq=None,
            shingled=_shingled_cached(spark, sf_dir),
        ),
    )


def _simhash_cached(spark, sf_dir):
    return _dedup_cached(
        spark,
        "simhash",
        sf_dir,
        lambda: DD.simhash(
            _t(spark, sf_dir, "documents"),
            tokenized=_toks_cached(spark, sf_dir),
        ),
    )


@register(
    "dedup_exact_stats",
    oracle="""
SELECT count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_unique,
       count(*) - count(DISTINCT md5(text)) AS n_dups
FROM documents
""",
    doc="Exact dedup: corpus duplicate stats via md5 group "
    "(operators/dedup.exact_dedup_stats)",
)
def q_dedup_exact_stats(spark, sf_dir):
    return DD.exact_dedup_stats(_t(spark, sf_dir, "documents"))


# Exact-substring dedup (Lee et al. 2021 arXiv:2107.06499, window-hash
# restatement — operators/substr.py). The oracle re-derives the whole
# pipeline: L-token window md5s, corpus-wide duplicate set, per-document
# gaps-and-islands span merge. Both engines hash the identical space-
# joined lowercase token windows, so results are exact-equal by
# construction. L=8 suits the ~30-token fixture docs; production raises it.
_SUBSTR_L = 8


def _substr_windows_cached(spark, sf_dir):
    # persisted window frame (the shingled_docs sharing pattern): the
    # duplicate-set plan references the window subtree twice (hash
    # aggregate + join-back), so an unshared frame would scan/tokenize/
    # hash the corpus twice — one pass per corpus, like a real cleaning
    # job; bench.py bills the materialization to substr_window_build
    from go_vectorsearch_spark.operators import substr as SUB

    return _dedup_cached(
        spark,
        "substr_windows",
        sf_dir,
        lambda: SUB.window_hashes(
            _t(spark, sf_dir, "documents"),
            L=_SUBSTR_L,
            tokenized=_toks_cached(spark, sf_dir),
        ),
    )


def _substr_flags_cached(spark, sf_dir):
    # the duplicated-window FAMILY subframe (_id, pos, _keep): the
    # stats entry's duplicated positions are all its rows, the cut
    # entry's removable/keeper split is the _keep partition — so the
    # duplicate-set shuffle over the corpus-token-sized window frame
    # (the family's one big groupBy + join-back) is paid once for both
    # registry entries; bench.py bills it to substr_flags_build
    from go_vectorsearch_spark.operators import substr as SUB

    cache = _session_cache(spark, "_gvs_dedup_cache")
    fresh_build = ("substr_flags", sf_dir) not in cache
    flags = _dedup_cached(
        spark,
        "substr_flags",
        sf_dir,
        lambda: SUB.duplicate_flags(_substr_windows_cached(spark, sf_dir)),
    )
    # flags is the window frame's ONLY consumer now (both registry
    # entries read flags) — once flags' eager materialization completes,
    # release the O(corpus tokens) cached window frame instead of
    # pinning it for the session. EVICT the cache entry along with the
    # unpersist: a stale handle left in _gvs_dedup_cache would look
    # cached but silently recompute the corpus-scale window build per
    # action for any future caller (the cache contract is "served
    # frames are materialized"); popping restores it — a later
    # _substr_windows_cached call rebuilds and re-persists honestly.
    # ONLY on the cache-miss path that just built flags: a cache-hit
    # call must not unpersist a window frame some LATER caller
    # re-cached via _substr_windows_cached (r10 advice — the
    # unconditional pop was exactly the silent-degradation hazard the
    # comment above warns about).
    if fresh_build:
        stale = cache.pop(("substr_windows", sf_dir), None)
        if stale is not None:
            stale.unpersist()
    return flags


@register(
    "dedup_exact_substr",
    oracle=rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - {_SUBSTR_L} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(
                          toks[i:i + {_SUBSTR_L - 1}], ' ')))}})) AS z
  FROM t
),
w2 AS (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM w),
d AS (SELECT wh FROM w2 GROUP BY wh HAVING count(*) > 1),
dw AS (SELECT doc_id, pos FROM w2 JOIN d USING (wh)),
g AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -{2 * _SUBSTR_L}) + {_SUBSTR_L}
              THEN 1 ELSE 0 END AS brk
  FROM dw
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM g
),
s AS (SELECT doc_id, island, min(pos) AS s_pos,
             max(pos) + {_SUBSTR_L} - 1 AS e_pos, count(*) AS n_windows
      FROM isl GROUP BY doc_id, island)
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(e_pos - s_pos + 1) AS BIGINT) AS dup_tokens,
       CAST(sum(n_windows) AS BIGINT) AS n_dup_windows
FROM s GROUP BY doc_id
""",
    doc="Exact-substring dedup stats (Lee et al. 2021): duplicated "
    f"{_SUBSTR_L}-token window hashes -> per-document maximal duplicated "
    "spans via partitioned gaps-and-islands; raw text never shuffles "
    "(operators/substr.exact_substr_stats)",
)
def q_dedup_exact_substr(spark, sf_dir):
    from go_vectorsearch_spark.operators import substr as SUB

    return SUB.exact_substr_stats(
        _t(spark, sf_dir, "documents"),
        L=_SUBSTR_L,
        flags=_substr_flags_cached(spark, sf_dir),
    )


def _substr_cut_oracle() -> str:
    """DuckDB twin of one keeper-protected exact_substr_cut pass.

    Re-derives the whole write-path semantics in SQL: window hashes over
    lowercase tokens (byte-identical to the Spark side), per-hash keeper
    = globally smallest (doc, pos), and the token filter — a token is
    cut iff covered by a removable window and by NO keeper window. The
    span merge is skipped on purpose: the islands' span cover equals the
    union of window token ranges (windows merge iff they overlap or
    touch), pinned by tests/test_substr.py's naive-reference test.
    Untouched documents hash their RAW text verbatim (the operator's
    pass-through contract); cut documents hash the space-joined
    original-case kept tokens."""
    Lm1 = _SUBSTR_L - 1
    return rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text,
         {_SQL_TOKENS} AS tl,
         regexp_split_to_array(trim(text), '\s+') AS torig
  FROM documents
),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tl) - {_SUBSTR_L} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(tl[i:i + {Lm1}], ' ')))}})) AS z
  FROM t
),
-- MATERIALIZED: w2 feeds the keeper aggregate AND the flag join, fl
-- feeds rmp AND kpp — unmarked, DuckDB inlines and recomputes each
-- reference (the whole window pass would run 4x)
w2 AS MATERIALIZED (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM w),
d AS (
  -- keeper = lexicographic min (doc, pos), packed into ONE BIGINT:
  -- doc_id * 2^32 + pos orders identically for doc_id < 2^31 and
  -- pos < 2^32 (the fixture domain by orders of magnitude). DuckDB's
  -- min over a STRUCT key measured 10-100x slower AND unstable here —
  -- the oracle is the engine's honest best, not a handicapped twin.
  SELECT wh, min(doc_id * 4294967296 + pos) AS kp
  FROM w2 GROUP BY wh HAVING count(*) > 1
),
fl AS MATERIALIZED (
  SELECT w2.doc_id, w2.pos,
         (w2.doc_id * 4294967296 + w2.pos = d.kp) AS keep
  FROM w2 JOIN d USING (wh)
),
rmp AS (SELECT doc_id, list(pos) AS rp FROM fl WHERE NOT keep GROUP BY doc_id),
kpp AS (SELECT doc_id, list(pos) AS kpos FROM fl WHERE keep GROUP BY doc_id),
-- kept-token indexes, computed only for docs carrying removable spans
kept AS (
  SELECT t.doc_id,
         list_filter(range(1, len(t.torig) + 1),
           i -> len(list_filter(r.rp,
                      p -> i >= p AND i <= p + {Lm1})) = 0
                OR len(list_filter(coalesce(k.kpos, []),
                      p -> i >= p AND i <= p + {Lm1})) > 0) AS ki
  FROM t JOIN rmp r USING (doc_id) LEFT JOIN kpp k USING (doc_id)
)
SELECT t.doc_id,
       -- verbatim passthrough when NOTHING is effectively cut: no
       -- removable spans (ki NULL) OR every removable token is
       -- keeper-covered (len(ki) = token count) — matching the Spark
       -- side's size(_cuts)=0 gate. coalesce: DuckDB's
       -- array_to_string([]) is NULL where Spark's concat_ws is '' —
       -- a fully-cut document must hash md5('')
       md5(CASE WHEN ki.ki IS NULL OR len(ki.ki) = len(t.torig) THEN t.text
           ELSE coalesce(array_to_string(list_transform(
             ki.ki, i -> t.torig[i::INT]), ' '), '')
           END) AS cut_md5
FROM t LEFT JOIN kept ki USING (doc_id)
"""


@register(
    "substr_cut_docs",
    oracle=_substr_cut_oracle(),
    doc="Keeper-protected exact-substring CUT (Lee et al. 2021), one "
    "full-corpus pass over the shared persisted window frame: per-hash "
    "keeper = globally smallest (doc, pos), removable/keeper spans via "
    "per-document islands, token filter as a pure array expression — "
    "the registry twin of Engine.substr_dedup_cut's read side "
    "(operators/substr.exact_substr_cut). Output is scalar-only "
    "(doc_id, md5 of the cleaned text): sequence-sensitive, "
    "driver-canonicalizable",
)
def q_substr_cut_docs(spark, sf_dir):
    from go_vectorsearch_spark.operators import substr as SUB

    docs = _t(spark, sf_dir, "documents")
    cut = SUB.exact_substr_cut(
        docs, L=_SUBSTR_L, flags=_substr_flags_cached(spark, sf_dir)
    )
    return cut.select("doc_id", F.md5(F.col("text")).alias("cut_md5"))


@register(
    "dedup_jaccard_pairs",
    oracle=rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(c::DOUBLE / (x.n + y.n - c)::DOUBLE, 6) AS jaccard
FROM common JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.2
""",
    doc="n-gram Jaccard similarity join: word-3-gram shingle explode + "
    "equi-join (operators/dedup.jaccard_pairs, threshold 0.2)",
)
def q_dedup_jaccard_pairs(spark, sf_dir):
    pairs = _jaccard_pairs_cached(spark, sf_dir)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _minhash_oracle() -> str:
    # sh already holds the md5_int32 shingle hashes (_SQL_SHINGLES), so
    # signature mins and the Jaccard verify both consume it directly —
    # mirroring minhash_lsh_pairs over shingled_docs.
    sig_cols = ",\n         ".join(
        f"coalesce(list_min(list_transform(sh, h -> ({a} * h + {b}) % {DD.MINHASH_P})), "
        f"{DD.MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(DD.MINHASH_PERMS)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {i} AS band, md5(concat_ws(',', {cols})) AS key FROM sig".format(
            i=i,
            cols=", ".join(f"m{i * DD.LSH_ROWS + j}" for j in range(DD.LSH_ROWS)),
        )
        for i in range(DD.LSH_BANDS)
    )
    return rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
-- len(sh) > 0: shingle-less docs are excluded exactly like the Spark
-- side (sentinel-signature collisions + 0/0 Jaccard otherwise)
shl AS (SELECT doc_id, sh FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t)
        WHERE len(sh) > 0),
sig AS (
  SELECT doc_id, sh,
         {sig_cols}
  FROM shl
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
v AS (
  -- intersection size bound ONCE (the Spark side binds it too): the
  -- oracle is the engine's honest best, not a handicapped twin
  SELECT id_a, id_b,
         len(list_intersect(x.sh, y.sh))::DOUBLE AS c,
         len(x.sh)::DOUBLE AS nx, len(y.sh)::DOUBLE AS ny
  FROM cand JOIN shl x ON x.doc_id = id_a JOIN shl y ON y.doc_id = id_b
)
SELECT id_a, id_b, round(c / (nx + ny - c), 6) AS jaccard
FROM v WHERE c / (nx + ny - c) >= 0.2
"""


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH near-dup: 16-perm signature, 4x4 banding, bucket-join "
    "candidates, exact-Jaccard verify (operators/dedup.minhash_lsh_pairs)",
)
def q_dedup_minhash_lsh(spark, sf_dir):
    pairs = DD.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.2,
        shingled=_shingled_cached(spark, sf_dir),
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _simhash_docs_oracle() -> str:
    # integer // on BIGINT is exact in DuckDB (never use double division:
    # the 60-bit hashes exceed float64's 2^53 exact range)
    weight_cols = ",\n         ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(DD.SIMHASH_BITS)
    )
    value = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(DD.SIMHASH_BITS)
    )
    h60 = "CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)"
    return rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
e AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t),
hh AS (SELECT doc_id, {h60} AS h FROM e),
w AS (
  SELECT doc_id,
         {weight_cols}
  FROM hh GROUP BY doc_id
)
SELECT doc_id, CAST({value} AS BIGINT) AS simhash FROM w
"""


# Demoted (r6) to tests/test_demoted_parity.py — ceded its window slot
# to the r5 pipeline operators (cdc/bpe/ngram/token-budget).
DEDUP_SIMHASH_DOCS_ORACLE = _simhash_docs_oracle()


def q_dedup_simhash_docs(spark, sf_dir):
    return _simhash_cached(spark, sf_dir)


# The simhash-pairs oracle wraps the per-doc sketch CTE with a pairwise
# Hamming filter; the Spark side's banded join is exactly equivalent for
# max_hamming < n_bands (pigeonhole), so strict equality is checkable.
@register(
    "dedup_simhash_pairs",
    oracle=rf"""
WITH s AS ({_simhash_docs_oracle().strip()})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {DD.SIMHASH_MAX_HAMMING}
""",
    doc="SimHash near-dup pairs, Hamming<=3: pigeonhole band join in Spark "
    "vs exhaustive pairwise xor/bit_count oracle - exact equivalence "
    "(operators/dedup.simhash_pairs)",
)
def q_dedup_simhash_pairs(spark, sf_dir):
    return DD.simhash_pairs(
        _t(spark, sf_dir, "documents"), sims=_simhash_cached(spark, sf_dir)
    )


@register(
    "dedup_neardup_survivors",
    oracle=rf"""
WITH RECURSIVE t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT id_a, id_b FROM common
  JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
  WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.2
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM jpairs
  UNION SELECT id_b, id_a FROM jpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u)
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE component < doc_id)
""",
    doc="Near-dup REMOVAL end to end: Jaccard pairs -> connected "
    "components (distributed min-label propagation) -> keep min id per "
    "cluster; oracle mirrors via a recursive reachability CTE "
    "(operators/dedup.neardup_dedup)",
)
def q_dedup_neardup_survivors(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir)
    return DD.neardup_dedup(docs, pairs).select("doc_id", "lang")


@register(
    "dedup_embedding_cosine",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
         / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
            * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4
""",
    doc="Embedding-cosine near-dup: blocked numpy GEMM all-pairs via "
    "mapInPandas vs exhaustive SQL oracle "
    "(operators/dedup.embedding_neardup_pairs, threshold 0.4)",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    pairs = DD.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# Curation family (operators/curation.py): PII redaction, benchmark
# decontamination, stratified sampling — the standard cleaning steps
# between raw scrape and tokenization. Fixture PII is injected by
# expression (identically in both engines) because the synthetic corpus
# contains none; the redaction itself is the operator under test.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.operators import curation as CUR  # noqa: E402

# deterministic dirty-corpus fixture: inject an email / phone / SSN into
# a known subset of docs (id mod 7 / 11 / 13)
_PII_INJECT_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com for details"),
        ),
    ).otherwise(F.lit("")),
    F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567 today")).otherwise(
        F.lit("")
    ),
    F.when(F.col("doc_id") % 13 == 0, F.lit(" ssn 123-45-6789 on file")).otherwise(
        F.lit("")
    ),
)

_PII_INJECT_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com for details' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 today' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789 on file' ELSE '' END"
)

# DuckDB string literals are standard-SQL (no backslash processing), so
# the Java-regex∩RE2 patterns drop in VERBATIM — '\b' in the SQL text
# reaches RE2 as the word-boundary token, exactly as Spark sees it.
_PII_SQL_REDACT = (
    "regexp_replace(regexp_replace(regexp_replace(dirty, "
    f"'{CUR.DEFAULT_PII_PATTERNS[0][1]}', '[EMAIL]', 'g'), "
    f"'{CUR.DEFAULT_PII_PATTERNS[1][1]}', '[SSN]', 'g'), "
    f"'{CUR.DEFAULT_PII_PATTERNS[2][1]}', '[PHONE]', 'g')"
)


# Demoted (r7) to tests/test_demoted_parity.py — ceded its window slot
# to decontaminate_spans (the curation family stays represented
# in-window by decontaminate_docs / text_quality / pipeline_clean_corpus).
PII_REDACT_ORACLE = rf"""
WITH dirty AS (SELECT doc_id, {_PII_INJECT_SQL} AS dirty FROM documents)
SELECT doc_id,
       len(regexp_extract_all(dirty, '{CUR.DEFAULT_PII_PATTERNS[0][1]}')) AS n_email,
       len(regexp_extract_all(dirty, '{CUR.DEFAULT_PII_PATTERNS[1][1]}')) AS n_ssn,
       len(regexp_extract_all(dirty, '{CUR.DEFAULT_PII_PATTERNS[2][1]}')) AS n_phone,
       md5({_PII_SQL_REDACT}) AS clean_md5
FROM dirty
"""


def q_pii_redact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", _PII_INJECT_SPARK().alias("_dirty"))
    red = CUR.redact_pii(dirty, text_col="_dirty", out_col="_clean")
    return red.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        F.md5(F.col("_clean")).alias("clean_md5"),
    )


# Demoted (r8) to tests/test_demoted_parity.py — ceded its window slot
# to ann_pca_exact (the PCA family's zero-loss anchor). Doc-level
# decontamination stays at the same DuckDB bar there; the stronger
# span-level signal (decontaminate_spans) keeps its window slot.
DECONTAMINATE_DOCS_ORACLE = rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t),
bench AS (SELECT doc_id AS bid, s FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id AS tid, s FROM sh WHERE doc_id % 97 <> 0),
ov AS (
  SELECT tid, bid, count(*) AS overlap
  FROM train JOIN bench USING (s)
  GROUP BY tid, bid
  HAVING count(*) >= 5
)
SELECT tid AS doc_id, count(*) AS n_bench_hits, max(overlap) AS max_overlap
FROM ov GROUP BY tid
"""


def q_decontaminate_docs(spark, sf_dir):
    shingled = _shingled_cached(spark, sf_dir)
    bench = shingled.filter(F.col("_id") % 97 == 0)
    train = shingled.filter(F.col("_id") % 97 != 0)
    flags = CUR.contamination_flags(train, bench, min_overlap=5)
    return flags.select(
        F.col("_id").alias("doc_id"), "n_bench_hits", "max_overlap"
    )


# Span-level decontamination (operators/substr.contaminated_spans): the
# exact verbatim >=L-token passages a training document shares with the
# benchmark split — located, not just flagged, so the cleaning job cuts
# the passage and keeps the document. L=4 here (the fixture's benchmark
# overlap is short); the oracle re-derives windows, the broadcastable
# benchmark hash set, and the per-document islands merge in SQL.
_DECON_L = 4


@register(
    "decontaminate_spans",
    oracle=rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - {_DECON_L} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(
                          toks[i:i + {_DECON_L - 1}], ' ')))}})) AS z
  FROM t
),
w2 AS (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM w),
bench AS (SELECT DISTINCT wh FROM w2 WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, pos FROM w2
  WHERE doc_id % 97 <> 0 AND wh IN (SELECT wh FROM bench)
),
g AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -{2 * _DECON_L}) + {_DECON_L}
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM g
)
SELECT doc_id, CAST(min(pos) AS INT) AS s_pos,
       CAST(max(pos) + {_DECON_L} - 1 AS INT) AS e_pos,
       count(*) AS n_windows
FROM isl GROUP BY doc_id, island
""",
    doc="Span-level benchmark decontamination: locate the exact verbatim "
    f">={_DECON_L}-token passages a training document shares with the "
    "benchmark split (id%97 fixture split; benchmark window hashes "
    "broadcast — the corpus never shuffles on window hash) "
    "(operators/substr.contaminated_spans)",
)
def q_decontaminate_spans(spark, sf_dir):
    from go_vectorsearch_spark.operators import substr as SUB

    docs = _t(spark, sf_dir, "documents")
    # both splits derive from the shared persisted token frame — the
    # entry pays window hashing + islands, not a fresh corpus tokenize
    toks = _toks_cached(spark, sf_dir)
    spans = SUB.contaminated_spans(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        L=_DECON_L,
        corpus_tokenized=toks.filter(F.col("_id") % 97 != 0),
        bench_tokenized=toks.filter(F.col("_id") % 97 == 0),
    )
    return spans.select(
        F.col("_id").alias("doc_id"), "s_pos", "e_pos", "n_windows"
    )


# Rotated INTO the driver window r10 (slot ceded by pagination_orders):
# the benchmark-cut write path at the full DuckDB bar — the no-keeper
# simplification of the windowed substr_cut_docs oracle (every matched
# window is removable; contaminated text has no copy worth keeping).
# Added r8 as a demoted-parity twin; it was the span family's last
# member without a driver-proved CORRECTNESS row.
DECONTAMINATE_CUT_ORACLE = rf"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text,
         {_SQL_TOKENS} AS tl,
         regexp_split_to_array(trim(text), '\s+') AS torig
  FROM documents
),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tl) - {_DECON_L} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(
                          tl[i:i + {_DECON_L - 1}], ' ')))}})) AS z
  FROM t
),
w2 AS MATERIALIZED (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM w),
bench AS (SELECT DISTINCT wh FROM w2 WHERE doc_id % 97 = 0),
rmp AS (
  SELECT doc_id, list(pos) AS rp FROM w2
  WHERE doc_id % 97 <> 0 AND wh IN (SELECT wh FROM bench)
  GROUP BY doc_id
)
SELECT t.doc_id,
       md5(CASE WHEN r.rp IS NULL THEN t.text
           ELSE coalesce(array_to_string(list_transform(
             list_filter(range(1, len(t.torig) + 1),
               i -> len(list_filter(r.rp,
                          p -> i >= p AND i <= p + {_DECON_L - 1})) = 0),
             i -> t.torig[i::INT]), ' '), '')
           END) AS cut_md5
FROM t LEFT JOIN rmp r USING (doc_id)
WHERE t.doc_id % 97 <> 0
"""


@register(
    "decontaminate_cut_docs",
    oracle=DECONTAMINATE_CUT_ORACLE,
    doc="Benchmark-decontamination CUT (the write path's read side): "
    f"every verbatim >={_DECON_L}-token benchmark window is removed "
    "from the training split, no keeper protection — contaminated text "
    "has no copy worth keeping. Benchmark hashes broadcast; the corpus "
    "never shuffles on window hash. Output is scalar-only (doc_id, md5 "
    "of the cleaned text) like substr_cut_docs "
    "(operators/substr.decontaminate_cut)",
)
def q_decontaminate_cut_docs(spark, sf_dir):
    from go_vectorsearch_spark.operators import substr as SUB

    docs = _t(spark, sf_dir, "documents")
    toks = _toks_cached(spark, sf_dir)
    cut = SUB.decontaminate_cut(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        L=_DECON_L,
        corpus_tokenized=toks.filter(F.col("_id") % 97 != 0),
        bench_tokenized=toks.filter(F.col("_id") % 97 == 0),
    )
    return cut.select("doc_id", F.md5(F.col("text")).alias("cut_md5"))


# Demoted (r6) to tests/test_demoted_parity.py — ceded its window slot
# to the r5 pipeline operators (cdc/bpe/ngram/token-budget).
SAMPLE_STRATIFIED_ORACLE = """
SELECT doc_id, lang FROM documents
WHERE (CAST(concat('0x', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)) % 100
      < CASE WHEN lang = 'en' THEN 60 WHEN lang = 'zh' THEN 30 ELSE 15 END
"""


def q_sample_stratified(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    samp = CUR.stratified_sample(
        docs, "lang", {"en": 60, "zh": 30}, default_pct=15, id_col="doc_id"
    )
    return samp.select("doc_id", "lang")


# Demoted (r7) to tests/test_demoted_parity.py — ceded its window slot
# to dedup_exact_substr (the exact-substring dedup family, the text-
# analysis family stays represented in-window by text_quality /
# quality_model_features).
TEXT_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         list_slice(regexp_split_to_array(trim(lower(text)), '\\s+'), 1, 200) AS toks
  FROM documents
), g AS (
  SELECT doc_id, lines,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS grams
  FROM t
), gc AS (
  SELECT doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS g2 FROM g)
  GROUP BY doc_id, g2
), gm AS (
  SELECT doc_id, max(c) AS top, sum(c) AS tot FROM gc GROUP BY doc_id
)
SELECT g.doc_id,
       len(lines) AS n_lines,
       round(1 - len(list_distinct(lines))::DOUBLE / len(lines), 6) AS dup_line_frac,
       round(len(list_filter(lines, l -> l LIKE '%...'))::DOUBLE / len(lines), 6)
         AS ellipsis_line_frac,
       round(gm.top::DOUBLE / gm.tot, 6) AS top_ngram_frac
FROM g LEFT JOIN gm ON g.doc_id = gm.doc_id
"""


def q_text_repetition(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return CUR.repetition_stats(docs, ngram=2, max_tokens=200)


# Rotated INTO the driver window r11 (slot ceded by join_semi_segment):
# corpus-level line/boilerplate dedup (CCNet §4.1 shape — strip lines
# whose document frequency crosses a threshold), added r10 as a
# demoted-parity twin and the family's only never-driver-proved oracle.
# The fixture documents are single-line with zero duplicated lines, so
# the query DERIVES a lined corpus identically on both engines (a shared
# footer keyed by doc_id % 7 → df ≈ 71 ≥ 10, cut everywhere; a unique
# trailer and the original text line at df = 1, kept) — the cut path
# executes for real under the full value-hash bar instead of a
# passthrough no-op.
_LINE_DEDUP_MIN_DF = 10


def _lined_corpus(docs: DataFrame) -> DataFrame:
    """THE derived lined-corpus fixture (shared footer keyed by
    doc_id % 7 → df ≈ corpus/7 ≥ min_df, cut everywhere; a unique
    trailer and the original text line at df = 1, kept) — ONE
    definition for every consumer: line_dedup_docs, the composed
    curation pipeline, the decade tool and the convergence-pin test
    all derive the corpus through this function, and the DuckDB
    oracles mirror it textually — a tweak here must change them too
    (the seeded_hash single-definition discipline)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nshared footer variant "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("\nunique trailer "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )

LINE_DEDUP_ORACLE = rf"""
WITH lined AS (
  SELECT doc_id,
         text || chr(10) || 'shared footer variant ' || CAST(doc_id % 7 AS VARCHAR)
              || chr(10) || 'unique trailer ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
),
t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
l AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS ix, unnest(ls) AS line
  FROM t
),
n AS (SELECT doc_id, ix, line, lower(trim(line)) AS nn FROM l),
hot AS (
  SELECT md5(nn) AS lh
  FROM (SELECT DISTINCT doc_id, nn FROM n WHERE len(nn) > 0)
  GROUP BY 1 HAVING count(*) >= {_LINE_DEDUP_MIN_DF}
),
kept AS (
  SELECT doc_id, ix, line FROM n
  WHERE md5(nn) NOT IN (SELECT lh FROM hot)
),
agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ix) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, md5(coalesce(a.clean, '')) AS clean_md5
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register(
    "line_dedup_docs",
    oracle=LINE_DEDUP_ORACLE,
    doc="Corpus-level line/boilerplate dedup (CCNet §4.1): strip lines "
    f"in >= {_LINE_DEDUP_MIN_DF} distinct docs over a derived lined "
    "corpus; hot set joins as a 16-byte-hash frame, never a collected "
    "literal (operators/curation.strip_boilerplate_lines)",
)
def q_line_dedup_docs(spark, sf_dir):
    """Corpus-level boilerplate-line strip over the derived lined corpus
    (operators/curation.strip_boilerplate_lines): hot set = normalized
    lines in >= min_df distinct documents, joined back as a frame; output
    is scalar-only (doc_id, md5 of the cleaned text), sequence-sensitive
    like the other cut twins."""
    docs = _t(spark, sf_dir, "documents")
    out = CUR.strip_boilerplate_lines(
        _lined_corpus(docs), min_df=_LINE_DEDUP_MIN_DF
    )
    return out.select("doc_id", F.md5("text").alias("clean_md5"))


# --- boilerplate_cut FIXPOINT oracle (r12) -------------------------------
# line_dedup_docs proves the single-pass strip; this entry windows the
# FIXPOINT machinery (curation.strip_boilerplate_fixpoint with the
# Engine's normalize=format_multiline_text hook, api.py boilerplate_cut's
# exact configuration): in-loop storage normalization, period-migration
# across min_df, and the irremovable empty-document-marker freeze. The
# derived corpus stages a cascade that NEEDS the fixpoint:
#   * 'zap footer' — hot everywhere (df ~ N/2), cut in pass 1; docs with
#     doc_id % 50 == 0 are zap-ONLY and fully empty -> frozen '.' marker;
#   * 'common tail <b>' (even docs, b = doc_id div 12, NO period) and
#     'common tail <b>.' (odd docs) — each form df ~ 6 < min_df, but
#     cutting the even docs' final zap line period-migrates their form
#     onto the odd docs' ('a\nb' -> 'a\nb.'), merging the family to
#     ~12 >= min_df: hot only in the PASS-2 fit, cut in pass 2;
#   * 'body <id> <md5(text)>' — unique per document (df = 1, carries the
#     real text through the hash), so pass 3's fit is EMPTY and the
#     2-pass DuckDB unroll below is exact. The convergence pin lives in
#     tests/test_curation.py (pass-3 hot set empty at sf0.01), the
#     curate-oracle precedent.
_BP_MIN_DF = 10


def _bp_corpus(docs: DataFrame) -> DataFrame:
    """THE derived fixpoint-cascade corpus — one definition shared by
    q_boilerplate_cut_docs, its convergence pin and the decade tool;
    the DuckDB oracle mirrors it textually (the _lined_corpus
    discipline)."""
    body = F.concat(
        F.lit("body "), F.col("doc_id").cast("string"),
        F.lit(" "), F.md5(F.col("text")),
    )
    tail = F.concat(
        F.lit("common tail "), F.expr("doc_id div 12").cast("string")
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 50 == 0, F.lit("zap footer"))
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(body, F.lit("\n"), tail, F.lit("\nzap footer")),
        )
        .otherwise(F.concat(body, F.lit("\n"), tail, F.lit(".")))
        .alias("text"),
    )


def _sql_fmt_multiline(x: str) -> str:
    """DuckDB restatement of documents._format_string (the storage
    normalization the fixpoint applies in-loop): CR-strip, newline
    collapse, whitespace trim, ensure trailing period ('' -> '.')."""
    t = (
        f"regexp_replace(regexp_replace(replace({x}, chr(13), ''), "
        f"'\\n\\n+', chr(10), 'g'), '^\\s+|\\s+$', '', 'g')"
    )
    return f"CASE WHEN {t} LIKE '%.' THEN {t} ELSE {t} || '.' END"


def _sql_bp_pass(k: int, src: str) -> str:
    """One unrolled fixpoint pass over active{k-1} -> active{k}/done{k}:
    fit hot lines (>= min_df distinct docs, normalized-nonempty), strip
    every occurrence, normalize CHANGED docs with the storage
    normalization, freeze docs that stripped to ''."""
    return f"""
l{k} AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS ix, unnest(ls) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {src})
),
n{k} AS (SELECT doc_id, ix, line, lower(trim(line)) AS nn FROM l{k}),
hot{k} AS (
  SELECT md5(nn) AS lh
  FROM (SELECT DISTINCT doc_id, nn FROM n{k} WHERE len(nn) > 0)
  GROUP BY 1 HAVING count(*) >= {_BP_MIN_DF}
),
agg{k} AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ix) AS clean
  FROM n{k} WHERE md5(nn) NOT IN (SELECT lh FROM hot{k})
  GROUP BY doc_id
),
r{k} AS (
  SELECT a.doc_id, a.text AS prev, coalesce(g.clean, '') AS clean
  FROM {src} a LEFT JOIN agg{k} g USING (doc_id)
),
p{k} AS (
  SELECT doc_id, clean,
         CASE WHEN clean = prev THEN prev
              ELSE {_sql_fmt_multiline('clean')} END AS text
  FROM r{k}
),
done{k} AS (
  SELECT doc_id, text FROM done{k - 1}
  UNION ALL SELECT doc_id, text FROM p{k} WHERE clean = ''
),
active{k} AS (SELECT doc_id, text FROM p{k} WHERE clean <> '')"""


BOILERPLATE_CUT_ORACLE = f"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0 THEN 'zap footer'
              WHEN doc_id % 2 = 0 THEN
                'body ' || CAST(doc_id AS VARCHAR) || ' ' || md5(text)
                || chr(10) || 'common tail ' || CAST(doc_id // 12 AS VARCHAR)
                || chr(10) || 'zap footer'
              ELSE
                'body ' || CAST(doc_id AS VARCHAR) || ' ' || md5(text)
                || chr(10) || 'common tail ' || CAST(doc_id // 12 AS VARCHAR)
                || '.'
         END AS text
  FROM documents
),
done0 AS (SELECT doc_id, text FROM src WHERE text = '.'),
active0 AS (SELECT doc_id, text FROM src WHERE text <> '.'),
{_sql_bp_pass(1, 'active0')},
{_sql_bp_pass(2, 'active1')}
SELECT doc_id, md5(text) AS clean_md5
FROM (SELECT * FROM active2 UNION ALL SELECT * FROM done2)
"""


@register(
    "boilerplate_cut_docs",
    oracle=BOILERPLATE_CUT_ORACLE,
    doc="Line/boilerplate-cut FIXPOINT (CCNet §4.1 iterated, the Engine "
    "boilerplate_cut configuration): in-loop storage normalization "
    "period-migrates a split line family across min_df between passes, "
    "fully-cut docs freeze as irremovable '.' markers; DuckDB twin "
    "unrolls the two cutting passes exactly "
    "(operators/curation.strip_boilerplate_fixpoint)",
)
def q_boilerplate_cut_docs(spark, sf_dir):
    """Fixpoint boilerplate cut over the derived cascade corpus — the
    windowed twin of Engine.boilerplate_cut (api.py): pass 1 cuts the
    corpus-hot footer (emptying the footer-only docs into frozen
    markers), the in-loop normalization merges the staged tail family
    across min_df, pass 2 cuts it, pass 3's fit is empty (pinned).
    Output is scalar-only (doc_id, md5 of final text) like the other
    cut twins."""
    from go_vectorsearch_spark.operators.documents import (
        EMPTY_DOC_MARKER,
        _format_multiline_string,
        format_multiline_text,
    )

    docs = _t(spark, sf_dir, "documents")
    # the derived corpus is read ~2x inside each fused pass (hot-fit
    # subtree, strip/prev subtree) — session-cache it so the md5
    # derivation and parquet scan run once (the curate entry's
    # stripped-frame precedent); the Engine path gets the same effect
    # from boilerplate_cut's persisted texts frame
    corpus = _dedup_cached(spark, "bp_corpus", sf_dir, lambda: _bp_corpus(docs))
    out = CUR.strip_boilerplate_fixpoint(
        corpus,
        min_df=_BP_MIN_DF,
        iterate=3,
        normalize=format_multiline_text,
        marker=EMPTY_DOC_MARKER,
        # pinned scalar twin of the EXPRESSION: at driver-checked
        # scales the fixpoint takes its adaptive local path (the
        # build_index discipline); the distributed loop is
        # equivalence-pinned in pytest
        normalize_py=_format_multiline_string,
    )
    res = out.select("doc_id", F.md5("text").alias("clean_md5"))
    # the fixpoint returns its result persisted (callers own the
    # release); a registry entry is consumed once by the driver, so
    # hand the projection over and release the cache afterwards is the
    # session's job — matches pipeline_curate_docs' fixpoint usage
    return res


# ---------------------------------------------------------------------------
# Phase E-3: document ingest pipeline (SURVEY.md §2.9 X1-X3) — Flatten /
# Split / task prefixes / deterministic embedder, driver-checked on the
# documents table. The oracles re-derive the same strings/codes in SQL.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.operators import documents as DOC  # noqa: E402

# formatString of a clean single-line value: trim + ensure trailing '.'
_SQL_FMT = "CASE WHEN trim({x}) LIKE '%.' THEN trim({x}) ELSE trim({x}) || '.' END"


@register(
    "doc_flatten_struct",
    oracle=f"""
SELECT doc_id,
       'lang: ' || {_SQL_FMT.format(x='lang')}
       || 'source: ' || {_SQL_FMT.format(x='source')}
       || 'text: ' || {_SQL_FMT.format(x='text')} AS flat
FROM documents
""",
    doc="X1 Flatten of a map payload: sorted keys, 'key: value' lines, the "
    "reference's no-separator-after-value quirk (server/format.go:70-89); "
    "Spark side runs the real JSON-parse + recursive Flatten UDF",
)
def q_doc_flatten_struct(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    payload = F.to_json(F.struct("lang", "source", "text"))
    return docs.select(
        "doc_id", DOC.flatten_json_udf(payload).alias("flat")
    )


@register(
    "doc_split_chunks",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, 'doc' || doc_id || '. ' AS prefix,
         'text: ' || {_SQL_FMT.format(x='text')} AS ftext
  FROM documents
), n AS (
  SELECT doc_id, prefix, ftext,
         len(regexp_split_to_array(ftext, '\s+')) AS nw
  FROM t
)
SELECT doc_id, 0 AS chunk_idx, 'search_document: ' || prefix AS chunk
FROM n WHERE nw > 14
UNION ALL
SELECT doc_id, CASE WHEN nw > 14 THEN 1 ELSE 0 END AS chunk_idx,
       'search_document: ' || prefix || ' ' || ftext AS chunk
FROM n
""",
    doc="X2/X3 Split chunker at ctx_num=64 (word budget 14) with doc-name "
    "prefix and search_document task prefix; over-budget lines emit the "
    "reference's prefix-only chunk (server/format.go:91-108)",
)
def q_doc_split_chunks(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("doc"), F.col("doc_id")).alias("name"),
        F.to_json(F.struct("text")).alias("payload_json"),
    )
    return DOC.prepare_chunks(docs, ctx_num=64)


def _noop_embed_oracle(dim: int = 64, seed: int = 0) -> str:
    n_blocks = (dim + 15) // 16
    hex_stream = " || ".join(
        f"md5('{seed}:' || text || ':{b}')" for b in range(n_blocks)
    )
    return f"""
WITH h AS (SELECT doc_id, {hex_stream} AS hx FROM documents),
c AS (
  SELECT doc_id,
         list_transform(generate_series(0, {dim - 1}),
                        i -> CAST(concat('0x', substr(hx, i*2 + 1, 2)) AS BIGINT)) AS codes
  FROM h
)
SELECT doc_id,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(codes[1] AS INTEGER) AS first_code,
       CAST(codes[{dim}] AS INTEGER) AS last_code
FROM c
"""


@register(
    "doc_noop_embed",
    oracle=_noop_embed_oracle(),
    doc="S12 deterministic content-keyed embedder (noop/ai.go:47-64 "
    "re-keyed): md5-block quantized codes as pure column expressions; "
    "checked via per-document code checksums at dim=64",
)
def q_doc_noop_embed(spark, sf_dir):
    from go_vectorsearch_spark.sources.tables import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    # stage the 64-block code array once: referenced three times below,
    # inlined it would be md5-derived 3x per row
    staged = docs.select(
        "doc_id", DOC.noop_embed_codes(F.col("text"), dim=64, seed=0).alias("_codes")
    )
    codes = F.col("_codes")
    return staged.select(
        "doc_id",
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c).alias("code_sum"),
        F.element_at(codes, 1).alias("first_code"),
        F.element_at(codes, 64).alias("last_code"),
    )


# ---------------------------------------------------------------------------
# Phase E-4: multimodal binary columns (operators/multimodal.py). The
# decode is stubbed (no media libs in container); the plumbing — binary
# payloads, typed metadata, mapInPandas feature extraction, expression-
# based frame/chunk planning — is real and oracle-checked.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.operators import multimodal as MM  # noqa: E402

_SQL_MEDIA_HEX = " || ".join(
    f"md5('media:' || text || ':{b}')" for b in range(MM._PAYLOAD_BLOCKS)
)
_SQL_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
_PB = MM._PAYLOAD_BLOCKS * 16  # payload bytes


@register(
    "multimodal_features",
    oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id, {_SQL_KIND} AS kind, {_SQL_MEDIA_HEX} AS hx
  FROM documents
), c AS (
  SELECT media_id, kind,
         list_transform(generate_series(0, {_PB} - 1),
                        i -> CAST(concat('0x', substr(hx, i*2 + 1, 2)) AS BIGINT)) AS codes
  FROM m
)
SELECT media_id, kind,
       CAST({_PB} AS INTEGER) AS n_bytes,
       CAST(list_sum(codes) AS BIGINT) AS byte_sum,
       CAST(codes[1] AS INTEGER) AS first_byte,
       CAST(codes[{_PB}] AS INTEGER) AS last_byte
FROM c
""",
    doc="Multimodal decode/feature-extract plumbing: binary payload + "
    "typed meta, Arrow-batched mapInPandas, stubbed decode emitting "
    "deterministic byte features (operators/multimodal.decode_features)",
)
def q_multimodal_features(spark, sf_dir):
    media = MM.synth_media(_t(spark, sf_dir, "documents"))
    return MM.decode_features(media)


# Demoted (r8) to tests/test_demoted_parity.py — ceded its window slot
# to substr_cut_docs (the keeper-protected cut's full oracle); the
# multimodal family stays represented in-window by multimodal_features.
MULTIMODAL_FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id AS media_id, unnest(generate_series(0, 1000 + (doc_id % 10) * 500, 500)) AS frame_ms
FROM documents WHERE {_SQL_KIND} = 'video'
"""


def q_multimodal_frame_sample(spark, sf_dir):
    media = MM.synth_media(_t(spark, sf_dir, "documents"))
    return MM.frame_sample(media, fps=2.0)


# ---------------------------------------------------------------------------
# Phase E-5: LSH-bucketed ANN (plans/lsh.py) — the stateless scale path
# beside IVF. The ±1 hyperplanes are md5-derived, so the oracle rebuilds
# identical planes and buckets in SQL.
# ---------------------------------------------------------------------------

from go_vectorsearch_spark.plans import lsh as LSH  # noqa: E402

_LSH_DIM = 64  # driver embeddings are 64-dim at every sf
# 16 bits = the at-scale bucket width (billions of rows -> ~10k rows per
# bucket); 6 bits = a width that yields populated buckets at this corpus
# size, used for the search/recall demos.
_LSH_PLANES = LSH.rademacher_planes(_LSH_DIM, n_bits=16)
_LSH_PLANES_SMALL = LSH.rademacher_planes(_LSH_DIM, n_bits=6)


def _lsh_bucketed_cached(spark, sf_dir):
    """The bucket-on-write frame shared by the three ANN/LSH queries
    (at scale ``_bucket`` is a stored column, never recomputed); cached
    once per corpus like the shingle frame, and billed to its own bench
    entry instead of whichever consumer runs first."""
    from go_vectorsearch_spark.sources.tables import spread

    emb = _t(spark, sf_dir, "embeddings")
    # spread: the bucket fold is expression-heavy per row and the
    # single-split sf parquet would otherwise persist (and serve every
    # LSH consumer) as ONE partition — no-op at real scale (_pq_cached)
    return _dedup_cached(
        spark,
        "lsh_bucketed_small",
        sf_dir,
        lambda: spread(emb).withColumn(
            "_bucket", LSH.lsh_bucket(F.col("embedding"), _LSH_PLANES_SMALL)
        ),
    )


def _lsh_bucket_cte(planes=None) -> str:
    rows = ",\n    ".join(
        "({b}, {pw}, [{sgn}])".format(
            b=b,
            pw=1 << b,
            sgn=", ".join(f"{s:.1f}" for s in signs),
        )
        for b, signs in enumerate(planes if planes is not None else _LSH_PLANES)
    )
    return f"""
planes(b, pw, sgn) AS (
  SELECT * FROM (VALUES
    {rows}
  ) AS t(b, pw, sgn)
),
bx AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_sum(list_transform(
                generate_series(1, len(e.embedding)),
                i -> e.embedding[i]::DOUBLE * p.sgn[i])) > 0
              THEN p.pw ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id
)"""


@register(
    "ann_lsh_buckets",
    oracle=f"""
WITH {_lsh_bucket_cte()}
SELECT bucket, count(*) AS n FROM bx GROUP BY bucket
""",
    doc="LSH bucketing: 16-bit sign-random-projection bucket per vector "
    "as a pure codegen expression; bucket histogram "
    "(plans/lsh.lsh_bucket, Rademacher planes from md5 bits)",
)
def q_ann_lsh_buckets(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("bucket", LSH.lsh_bucket(F.col("embedding"), _LSH_PLANES))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "ann_lsh_search",
    oracle=f"""
WITH {_lsh_bucket_cte(_LSH_PLANES_SMALL)},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT bucket FROM bx WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN bx ON bx.vec_id = e.vec_id
  WHERE bx.bucket = (SELECT bucket FROM qb)
)
SELECT c.vec_id,
       round(
         list_sum(list_transform(generate_series(1, len(c.embedding)),
                                 i -> c.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS score
FROM cand c, q
ORDER BY score DESC, c.vec_id ASC
LIMIT {TOPK_K}
""",
    doc="LSH ANN search: score only the query's bucket (partition pruning "
    "at scale when data is written partitionBy(bucket)) "
    "(plans/lsh.lsh_search, probe_radius=0)",
)
def q_ann_lsh_search(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    bucketed = _lsh_bucketed_cached(spark, sf_dir)
    res = LSH.lsh_search(
        emb,
        qvec,
        k=TOPK_K,
        probe_radius=0,
        planes=_LSH_PLANES_SMALL,
        bucketed=bucketed,
    )
    return res.select("vec_id", F.round("score", 6).alias("score"))


from math import floor as math_floor  # noqa: E402


def _dequant_f64(vec: list[float]) -> list[float]:
    """Driver-side f64 quantize->dequantize with §1.3 semantics (f32
    range narrowing, clamp, truncation) - formula order matches the SQL
    oracle text exactly so the doubles are bit-identical."""
    import numpy as np

    lo = float(np.float32(min(min(vec), 0.0)))
    hi = float(np.float32(max(max(vec), 0.0)))
    if hi - lo == 0:
        return [0.0] * len(vec)
    out = []
    for x in vec:
        c = math_floor((min(max(float(x), lo), hi) - lo) / (hi - lo) * 255)
        out.append(lo + c / 255.0 * (hi - lo))
    return out


# r9 demotion — ceded its window slot to ann_ivfpq_exact (the PQ
# family's exactness anchor); its semantics stay driver-proved as the
# composition of the in-window cosine_topk (V2) and quantize_roundtrip
# (V4/V5) anchors, and the full oracle keeps running at the identical
# bar in tests/test_demoted_parity.py.
COSINE_TOPK_QUANTIZED_ORACLE = f"""
WITH rng AS (
  SELECT vec_id, embedding,
         CAST(CAST(least(list_min(embedding), 0) AS REAL) AS DOUBLE) AS lo,
         CAST(CAST(greatest(list_max(embedding), 0) AS REAL) AS DOUBLE) AS hi
  FROM embeddings
), dq AS (
  SELECT vec_id,
         CASE WHEN hi - lo = 0 THEN list_transform(embedding, x -> 0.0)
              ELSE list_transform(embedding,
                     x -> lo + floor((least(greatest(x::DOUBLE, lo), hi) - lo) / (hi - lo) * 255) / 255.0 * (hi - lo))
         END AS v
  FROM rng
), q AS (SELECT v AS qv FROM dq WHERE vec_id = 0)
SELECT d.vec_id,
       round(
         CASE WHEN sqrt(list_sum(list_transform(d.v, x -> x * x)))
                   * sqrt(list_sum(list_transform(q.qv, x -> x * x))) = 0 THEN 0.0
         ELSE list_sum(list_transform(generate_series(1, len(d.v)), i -> d.v[i] * q.qv[i]))
              / (sqrt(list_sum(list_transform(d.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) END,
         6) AS score
FROM dq d, q
ORDER BY score DESC, d.vec_id ASC
LIMIT {TOPK_K}
"""


def q_cosine_topk_quantized(spark, sf_dir):
    """Search over the engine's QUANTIZED managed store (api.quantized_
    store / api.dequantized_vector — the same helpers Engine.upload/
    search run): codes dequantized on the fly in the scoring expression
    — the 4x-memory path the reference always runs (it never stores
    full precision, ai/aicomms/embed.go:42-50); f64 mode so the DuckDB
    oracle reproduces codes exactly. Demoted r9 (window slot ceded to
    ann_ivfpq_exact); full parity in tests/test_demoted_parity.py."""
    from go_vectorsearch_spark.api import quantized_store
    from go_vectorsearch_spark.functions.vector import dequantize

    emb = _t(spark, sf_dir, "embeddings")
    qraw = _qvec(spark, sf_dir)
    qvec = _dequant_f64(list(qraw))
    # canonical store form (id, codes, lo, hi) via the Engine's helper;
    # f64 arithmetic here (vs the engine's f32 default) only so the
    # DuckDB oracle can reproduce the codes bit-for-bit
    store = quantized_store(emb, id_col="vec_id", vec_col="embedding", precision="float64")
    dq = store.select(
        "vec_id",
        dequantize(F.col("codes"), F.col("lo"), F.col("hi"), "float64").alias(
            "embedding"
        ),
    )
    topk = brute_force_topk(dq, qvec, TOPK_K, id_col="vec_id", vec_col="embedding")
    return topk.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "batch_search_topk",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS sim
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(sim, 6) AS score
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rn
      FROM s)
WHERE rn <= 3
""",
    doc="Batched multi-query search: Q query vectors scored in one pass "
    "(broadcast queries x corpus, per-query window top-k) - the "
    "Spark-native batch shape the per-request reference cannot express",
)
def q_batch_search_topk(spark, sf_dir):
    from pyspark.sql import Window

    from go_vectorsearch_spark.functions.vector import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from go_vectorsearch_spark.sources.tables import spread

    # spread the corpus side only (the broadcast query side must stay a
    # tiny unshuffled scan): Q interpreted-HOF cosines per row on a
    # one-split scan ran single-task (see q_cosine_topk)
    scored = spread(emb).crossJoin(F.broadcast(qdf)).withColumn(
        "sim", cosine_similarity(F.col("embedding"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id", F.round("sim", 6).alias("score"))
    )


@register(
    "pipeline_clean_corpus",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, lang, text, {_SQL_TOKENS} AS toks,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
           / length(text)::DOUBLE AS ar
  FROM documents
), q AS (
  SELECT doc_id, lang, text,
         0.4 * ar
         + 0.3 * (1.0 - abs(len(list_filter(toks, tok -> list_contains([{_SQL_STOPLIST}], tok)))::DOUBLE
                            / len(toks)::DOUBLE - 0.4))
         + 0.3 * least(list_sum(list_transform(toks, tok -> length(tok)))::DOUBLE
                       / len(toks)::DOUBLE / 8.0, 1.0) AS quality,
         len(toks) AS n_tokens
  FROM t
), kept AS (
  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang,
         any_value(quality) AS quality, any_value(n_tokens) AS n_tokens
  FROM q WHERE quality >= 0.5 GROUP BY md5(text)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM kept GROUP BY lang
""",
    doc="Composed training-data prep pipeline: quality-filter -> exact "
    "dedup (keep min id) -> per-language corpus stats - the operators "
    "chained the way a real cleaning job runs them",
)
def q_pipeline_clean_corpus(spark, sf_dir):
    from go_vectorsearch_spark.operators.dedup import exact_dedup
    from go_vectorsearch_spark.sources.tables import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    # stage tokens once; quality_score(text) would re-tokenize 3x
    staged = docs.select(
        "doc_id", "lang", "text", T.ws_tokens(F.col("text")).alias("_toks")
    )
    quality = T.quality_score_from_parts(
        T.alpha_ratio(F.col("text")),
        T.stopword_ratio(F.col("_toks")),
        T.mean_token_len(F.col("_toks")),
    )
    scored = staged.select(
        "doc_id",
        "lang",
        "text",
        quality.alias("quality"),
        F.size("_toks").cast("long").alias("n_tokens"),
    ).filter(F.col("quality") >= 0.5)
    kept = exact_dedup(scored, id_col="doc_id", text_col="text")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# The END-TO-END pretraining-curation pipeline (r10 verdict task 4): every
# cleaning stage a real 100 TB curation job runs, COMPOSED in one entry —
# boilerplate-line strip → keeper-protected exact-substring cut (fixpoint)
# → benchmark decontamination cut → Jaccard near-dup dedup → quality
# filter → per-language token-budget mix — with the whole chain re-derived
# in ONE DuckDB statement. Each stage has its own in-window/demoted oracle
# already; this entry proves the stages COMPOSE (each stage consumes the
# previous stage's REBUILT text, so tokenization/rebuild conventions have
# to round-trip across operators, which no per-stage oracle can see).
#
# Stage dials (module constants so Spark and SQL read the same values):
# the lined-corpus derivation and min_df=10 are line_dedup_docs'; L=8 is
# the substring family's; L=4 + the id%97 split are the decontamination
# family's; Jaccard threshold 0.2 (uncapped — oracle-parity mode, see
# _jaccard_pairs_cached) is the near-dup family's; quality >= 0.68 is
# calibrated to the CLEANED fixture (keeps ~88%, drops ~12% — a 0.5 bar
# passes everything post-cut; nearest doc sits 5e-5 away so cross-engine
# double noise (~1e-15) cannot flip membership); the {en:4000, zh:1500,
# default 2500} budgets are token_budget_sample's.
#
# The substring-cut stage runs iterate=3 (fixpoint) on the Spark side
# while the oracle derives ONE pass: the cleaned fixture converges after
# pass 1 at sf0.001 AND sf0.01 (pinned by
# tests/test_curation.py::test_curate_pipeline_substr_stage_converges_in_one_pass;
# if a future fixture regenerate broke that, THIS oracle would fail the
# driver gate loudly, not drift silently).
#
# Scalar outputs per language: doc count, token count, and an
# order-independent corpus signature (sum of md5_int32 of each surviving
# text — commutative, so neither engine needs a global sort to agree).
_CURATE_QUALITY_MIN = 0.68
_CURATE_BUDGETS = {"en": 4000, "zh": 1500}
_CURATE_DEFAULT_BUDGET = 2500


def _curate_docs_oracle() -> str:
    Ls, Ld = _SUBSTR_L, _DECON_L
    budget_sql = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_CURATE_BUDGETS.items())
    )
    return rf"""
WITH RECURSIVE lined AS (
  SELECT doc_id,
         text || chr(10) || 'shared footer variant ' || CAST(doc_id % 7 AS VARCHAR)
              || chr(10) || 'unique trailer ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
),
-- STAGE 1: corpus-level boilerplate-line strip (line_dedup_docs' exact
-- derivation and semantics, emitting the CLEANED TEXT instead of its md5)
ll AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS ix, unnest(ls) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined)
),
ln AS (SELECT doc_id, ix, line, lower(trim(line)) AS nn FROM ll),
hot AS (
  SELECT md5(nn) AS lh
  FROM (SELECT DISTINCT doc_id, nn FROM ln WHERE len(nn) > 0)
  GROUP BY 1 HAVING count(*) >= {_LINE_DEDUP_MIN_DF}
),
lagg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ix) AS clean
  FROM ln WHERE md5(nn) NOT IN (SELECT lh FROM hot)
  GROUP BY doc_id
),
stripped AS (
  SELECT d.doc_id, coalesce(a.clean, '') AS text
  FROM lined d LEFT JOIN lagg a USING (doc_id)
),
-- STAGE 2: keeper-protected exact-substring cut, one pass (the
-- substr_cut_docs oracle retargeted FROM stripped; fixture converges
-- after pass 1, so this equals the Spark side's fixpoint)
st AS MATERIALIZED (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tl,
         regexp_split_to_array(trim(text), '\s+') AS torig
  FROM stripped
),
sw AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tl) - {Ls} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(tl[i:i + {Ls - 1}], ' ')))}})) AS z
  FROM st
),
sw2 AS MATERIALIZED (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM sw),
sd AS (
  SELECT wh, min(doc_id * 4294967296 + pos) AS kp
  FROM sw2 GROUP BY wh HAVING count(*) > 1
),
sfl AS MATERIALIZED (
  SELECT sw2.doc_id, sw2.pos,
         (sw2.doc_id * 4294967296 + sw2.pos = sd.kp) AS keep
  FROM sw2 JOIN sd USING (wh)
),
srm AS (SELECT doc_id, list(pos) AS rp FROM sfl WHERE NOT keep GROUP BY doc_id),
skp AS (SELECT doc_id, list(pos) AS kpos FROM sfl WHERE keep GROUP BY doc_id),
skept AS (
  SELECT st.doc_id,
         list_filter(range(1, len(st.torig) + 1),
           i -> len(list_filter(r.rp,
                      p -> i >= p AND i <= p + {Ls - 1})) = 0
                OR len(list_filter(coalesce(k.kpos, []),
                      p -> i >= p AND i <= p + {Ls - 1})) > 0) AS ki
  FROM st JOIN srm r USING (doc_id) LEFT JOIN skp k USING (doc_id)
),
cut AS (
  SELECT st.doc_id,
         CASE WHEN ki.ki IS NULL OR len(ki.ki) = len(st.torig) THEN st.text
         ELSE coalesce(array_to_string(list_transform(
           ki.ki, i -> st.torig[i::INT]), ' '), '')
         END AS text
  FROM st LEFT JOIN skept ki USING (doc_id)
),
-- STAGE 3: benchmark decontamination cut, no keeper (the
-- decontaminate_cut_docs oracle retargeted FROM cut); the id%97
-- benchmark split leaves the corpus here
dt AS MATERIALIZED (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tl,
         regexp_split_to_array(trim(text), '\s+') AS torig
  FROM cut
),
dw AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tl) - {Ld} + 1, 0)),
           i -> {{'pos': i,
                  'wh': unhex(md5(array_to_string(tl[i:i + {Ld - 1}], ' ')))}})) AS z
  FROM dt
),
dw2 AS MATERIALIZED (SELECT doc_id, z.pos AS pos, z.wh AS wh FROM dw),
dbench AS (SELECT DISTINCT wh FROM dw2 WHERE doc_id % 97 = 0),
drmp AS (
  SELECT doc_id, list(pos) AS rp FROM dw2
  WHERE doc_id % 97 <> 0 AND wh IN (SELECT wh FROM dbench)
  GROUP BY doc_id
),
decon AS (
  SELECT dt.doc_id,
         CASE WHEN r.rp IS NULL THEN dt.text
         ELSE coalesce(array_to_string(list_transform(
           list_filter(range(1, len(dt.torig) + 1),
             i -> len(list_filter(r.rp,
                        p -> i >= p AND i <= p + {Ld - 1})) = 0),
           i -> dt.torig[i::INT]), ' '), '')
         END AS text
  FROM dt LEFT JOIN drmp r USING (doc_id)
  WHERE dt.doc_id % 97 <> 0
),
-- STAGE 4: Jaccard near-dup dedup over the CLEANED text (the
-- dedup_neardup_survivors oracle retargeted FROM decon: hashed
-- word-3-gram shingles -> pairs >= 0.2 -> connected components ->
-- keep min id)
jt AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM decon),
jsh AS (
  SELECT doc_id, unnest(sh) AS s
  FROM (SELECT doc_id,
               list_distinct(list_transform(
                 list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
                 s -> {_SQL_H32.format(x='s')})) AS sh
        FROM jt)
),
jsz AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
jcommon AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM jsh a JOIN jsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT id_a, id_b FROM jcommon
  JOIN jsz x ON x.doc_id = id_a JOIN jsz y ON y.doc_id = id_b
  WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.2
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM jpairs
  UNION SELECT id_b, id_a FROM jpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u),
survivors AS (
  SELECT * FROM decon
  WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE component < doc_id)
),
-- STAGE 5: quality filter on the cleaned text (pipeline_clean_corpus'
-- scoring, threshold recalibrated to the post-cut corpus)
q AS (
  SELECT s.doc_id, d.lang, s.text,
         regexp_split_to_array(lower(trim(s.text)), '\s+') AS toks,
         length(regexp_replace(s.text, '[^A-Za-z]', '', 'g'))::DOUBLE
           / length(s.text)::DOUBLE AS ar
  FROM survivors s JOIN documents d USING (doc_id)
),
qkept AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           0.4 * ar
           + 0.3 * (1.0 - abs(len(list_filter(toks, tok -> list_contains([{_SQL_STOPLIST}], tok)))::DOUBLE
                              / len(toks)::DOUBLE - 0.4))
           + 0.3 * least(list_sum(list_transform(toks, tok -> length(tok)))::DOUBLE
                         / len(toks)::DOUBLE / 8.0, 1.0) AS quality
    FROM q
  ) WHERE quality >= {_CURATE_QUALITY_MIN}
),
-- STAGE 6: per-language token-budget mix (token_budget_sample's
-- content-addressed prefix, counting the CLEANED text's tokens)
bt AS (
  SELECT doc_id, lang, text,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         CAST(concat('0x', substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS addr,
         CASE lang {budget_sql} ELSE {_CURATE_DEFAULT_BUDGET} END AS budget
  FROM qkept
),
sampled AS (
  SELECT doc_id, lang, text, n_tok FROM (
    SELECT *, sum(n_tok) OVER (
      PARTITION BY lang ORDER BY addr, doc_id
      ROWS UNBOUNDED PRECEDING) AS cum
    FROM bt
  ) WHERE cum <= budget
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum({_SQL_H32.format(x='text')}) AS BIGINT) AS corpus_sig
FROM sampled GROUP BY lang
"""


@register(
    "pipeline_curate_docs",
    oracle=_curate_docs_oracle(),
    doc="END-TO-END pretraining curation, composed: boilerplate-line "
    "strip -> keeper-protected exact-substring cut (fixpoint) -> "
    "benchmark decontamination cut -> Jaccard near-dup dedup -> quality "
    "filter -> per-language token-budget mix; per-lang doc/token counts "
    "+ order-independent corpus signature, whole chain re-derived in one "
    "DuckDB statement",
)
def q_pipeline_curate_docs(spark, sf_dir):
    from go_vectorsearch_spark.functions.text import md5_int32
    from go_vectorsearch_spark.operators import substr as SUB

    docs = _t(spark, sf_dir, "documents")
    # the stripped frame is read TWICE inside the substring cut's first
    # pass (the window-hash side and the token-rebuild side are separate
    # subtrees — no exchange between them to reuse), so it rides the
    # session cache like the decon frame below; unpersisted, pass 1 ran
    # the line-strip regroup twice per cold entry (r12)
    stripped = _dedup_cached(
        spark,
        "curate_stripped",
        sf_dir,
        lambda: CUR.strip_boilerplate_lines(
            _lined_corpus(docs), min_df=_LINE_DEDUP_MIN_DF
        ),
        eager=False,  # the cut's first job materializes it (r13)
    )
    # pass-1 window sharing moved INTO exact_substr_cut (r13
    # self-review): the old session-cached windows hint was built and
    # materialized eagerly here, then IGNORED whenever the cut's
    # adaptive gate took the corpus driver-local — the operator now
    # builds (and releases) the pass-1 frame itself exactly when its
    # distributed path runs. The fixpoint's return frame comes back
    # persisted+materialized, so the bench and train splits below read
    # cache, not a recomputed chain.
    cut = SUB.exact_substr_cut(stripped, L=_SUBSTR_L, iterate=3)
    bench = cut.filter(F.col("doc_id") % 97 == 0)
    train = cut.filter(F.col("doc_id") % 97 != 0)
    # persist the decontaminated corpus: three downstream consumers
    # reference it (the shingle frame, the near-dup anti-join's row
    # side, the quality/budget stages) — unpersisted, each would re-run
    # the L=4 window pass + rebuild (~3x the stage's cost; measured
    # ~4 s at sf0.1). Cached through _dedup_cached so repeated
    # invocations (bench cold+warm runs, decade sampling) REUSE one
    # materialized copy per corpus with the family's session-scoped
    # lifecycle instead of issuing a fresh persist per call (Spark's
    # CacheManager would dedup the identical plan anyway, but the
    # session cache makes the lifecycle explicit); the fixpoint's
    # internal persists dedup the same way. A deployment checkpoints
    # between stages instead.
    decon = _dedup_cached(
        spark,
        "curate_decon",
        sf_dir,
        lambda: SUB.decontaminate_cut(train, bench, L=_DECON_L),
        eager=False,  # the shingle pass materializes it (r13)
    )
    # uncapped jaccard = oracle-parity mode (see _jaccard_pairs_cached);
    # a production run passes the default hot-shingle cap
    pairs = DD.jaccard_pairs(decon, threshold=0.2, max_shingle_freq=None)
    kept = DD.neardup_dedup(decon, pairs)
    staged = kept.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "text", T.ws_tokens(F.col("text")).alias("_toks")
    )
    quality = T.quality_score_from_parts(
        T.alpha_ratio(F.col("text")),
        T.stopword_ratio(F.col("_toks")),
        T.mean_token_len(F.col("_toks")),
    )
    qkept = staged.select("doc_id", "lang", "text", quality.alias("_q")).filter(
        F.col("_q") >= _CURATE_QUALITY_MIN
    )
    sampled = CUR.token_budget_sample(
        qkept.select("doc_id", "lang", "text"),
        "lang",
        _CURATE_BUDGETS,
        default_budget=_CURATE_DEFAULT_BUDGET,
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(T.ws_tokens(F.col("text")))).alias("total_tokens"),
        F.sum(md5_int32(F.col("text"))).alias("corpus_sig"),
    )


@register(
    "validate_documents",
    oracle="""
SELECT count(*) AS n_rows,
       count(*) FILTER (WHERE length(text) <> n_chars) AS bad_n_chars,
       count(*) FILTER (WHERE text IS NULL OR trim(text) = '') AS empty_text,
       count(*) FILTER (WHERE lang NOT IN ('de', 'en', 'es', 'zh')) AS bad_lang,
       count(DISTINCT doc_id) AS distinct_ids
FROM documents
""",
    doc="Data-validation operator: constraint counts (stored-length "
    "consistency, empties, domain checks, key uniqueness) in one scan",
)
def q_validate_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.length("text") != F.col("n_chars")).alias("bad_n_chars"),
        F.count_if(F.col("text").isNull() | (F.trim("text") == "")).alias("empty_text"),
        F.count_if(~F.col("lang").isin(["de", "en", "es", "zh"])).alias("bad_lang"),
        F.countDistinct("doc_id").alias("distinct_ids"),
    )


# On-disk partitioned IVF store, built once per sf_dir: the engine's
# IVF-at-scale claim is that the assigned table written
# partitionBy("centroid_id") gives the same partition pruning as the
# reference's indexed FK column (database/model.go:16). Search with
# nprobe=all through the on-disk store must equal brute force exactly,
# which makes it oracle-checkable; the nprobe<all pruned-plan assertion
# (PartitionFilters in the physical plan) lives in tests/test_ivf.py.



def _ivf_store_path(spark, sf_dir: str) -> str:
    cache = _session_cache(spark, "_gvs_ivf_store_cache")
    if sf_dir not in cache:
        import tempfile

        from go_vectorsearch_spark.plans.ivf import write_partitioned

        path = tempfile.mkdtemp(prefix="spark_graft_ivf_store_")
        write_partitioned(_ivf_index(spark, sf_dir), path)
        cache[sf_dir] = path
    return cache[sf_dir]


@register(
    "ivf_partitioned_probe",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS score
FROM embeddings e, q
ORDER BY score DESC, e.vec_id ASC
LIMIT {TOPK_K}
""",
    doc="IVF searched through the ON-DISK partitionBy(centroid_id) store "
    "(plans/ivf.write_partitioned/read_index): probing all partitions "
    "must equal brute force; at nprobe<all the same plan reads only the "
    "probed directories (PartitionFilters, asserted in tests/test_ivf.py)",
)
def q_ivf_partitioned_probe(spark, sf_dir):
    from go_vectorsearch_spark.plans.ivf import ivf_search, read_index

    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    index = read_index(spark, _ivf_store_path(spark, sf_dir))
    # nprobe=all (2^31-1 clamps to the centroid count inside
    # nearest_centroids — no separate count() job)
    res = ivf_search(index, qvec, k=TOPK_K, nprobe=2**31 - 1)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "rag_prompts_batch",
    oracle="""
WITH q AS (
  SELECT doc_id AS q_id, substr(text, 1, 40) AS question
  FROM documents WHERE doc_id % 100 = 0
), r AS (
  SELECT q.q_id, d.doc_id - q.q_id AS rank, substr(d.text, 1, 30) AS doc_text
  FROM q JOIN documents d ON d.doc_id IN (q.q_id + 1, q.q_id + 2)
), packed AS (
  SELECT q_id, count(*) AS n,
         string_agg('\"\"\"' || doc_text || '\"\"\"' || chr(10), '' ORDER BY rank) AS quoted
  FROM r GROUP BY q_id
)
SELECT q.q_id,
       CASE WHEN p.n IS NULL THEN '' ELSE
         'I have ' || p.n || ' text document that I''d like to use as context '
         || 'for my question. Here''s the relevant part'
         || (CASE WHEN p.n > 1 THEN 's' ELSE '' END) || ':' || chr(10) || chr(10)
         || p.quoted || chr(10)
       END || 'My question is: ' || q.question AS prompt
FROM q LEFT JOIN packed p USING (q_id)
""",
    doc="X5 batch RAG prompt assembly (operators/rag.rag_prompts): every "
    "100th doc becomes a question, its two successors the retrieved "
    "context; the reference-shaped prompt (server/chat.go:141-168 "
    "quoting/marker/singular-'document' quirks) is built as pure "
    "Catalyst expressions — one shuffle, no UDFs",
)
def q_rag_prompts_batch(spark, sf_dir):
    from go_vectorsearch_spark.operators.rag import rag_prompts

    docs = _t(spark, sf_dir, "documents")
    questions = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("q_id"), F.substring("text", 1, 40).alias("question")
    )
    d2 = docs.select("doc_id", F.substring("text", 1, 30).alias("doc_text"))
    retrieved = (
        questions.join(
            d2,
            (F.col("doc_id") == F.col("q_id") + 1)
            | (F.col("doc_id") == F.col("q_id") + 2),
        )
        .select(
            "q_id",
            (F.col("doc_id") - F.col("q_id")).cast("int").alias("rank"),
            "doc_text",
        )
    )
    return rag_prompts(questions, retrieved).select("q_id", "prompt")


# ---------------------------------------------------------------------------
# Rows-only diagnostics (no SQL oracle by nature: k-means-dependent stats,
# recall-vs-brute-force quality sweeps, f32 codec checksums). Registered
# LAST so every oracle-backed query sits ahead of them in the registry.
# ---------------------------------------------------------------------------


@register(
    "vector_pack_roundtrip",
    oracle=None,  # f32 quantization codes are not reproducible in the
    # f64-only oracle engine; pytest cross-validates the codec against
    # the Catalyst f32 expression path instead (tests/test_vector_kernels)
    doc="Binary vector codec: bit-exact reference []byte layout "
    "[min f32 LE][max f32 LE][D x uint8] (compute/quantization.go:71-80); "
    "pack -> unpack roundtrip checksums per vector",
)
def q_vector_pack_roundtrip(spark, sf_dir):
    from go_vectorsearch_spark.functions.vector import pack_vector_udf, unpack_vector_udf
    from go_vectorsearch_spark.sources.tables import spread

    # a deterministic 1-in-10 sample: the codec check's power is
    # per-vector (layout + round-trip checksum), so validating 10% of
    # the corpus validates the codec — running every vector through two
    # Python UDF stages was pure diagnostic overhead at bench time
    emb = spread(
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    )
    packed = emb.select(
        "vec_id", pack_vector_udf()(F.col("embedding")).alias("b")
    ).select("vec_id", F.length("b").alias("n_bytes"), unpack_vector_udf()(F.col("b")).alias("u"))
    return packed.select(
        "vec_id",
        "n_bytes",
        F.aggregate(F.col("u.codes"), F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        F.round(F.col("u.lo").cast("double"), 6).alias("lo"),
        F.round(F.col("u.hi").cast("double"), 6).alias("hi"),
    )


@register(
    "ivf_build_stats",
    oracle=None,  # k-means dependent: rows-only check
    doc="C2/C3/C6 index build statistics: centroid count, leaf-size "
    "bounds, nprobe=1 recall@10 vs brute force",
)
def q_ivf_build_stats(spark, sf_dir):
    from go_vectorsearch_spark.plans.ivf import ivf_search

    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    index = _ivf_index(spark, sf_dir)
    sizes = index.assigned.groupBy("centroid_id").agg(F.count("*").alias("cnt"))
    stats = sizes.agg(
        F.count("*").alias("n_centroids"),
        F.min("cnt").alias("min_leaf"),
        F.max("cnt").alias("max_leaf"),
        F.sum("cnt").alias("n_assigned"),
    ).head()
    bf = _bf_ids(spark, sf_dir, 10)
    ivf1 = {r["vec_id"] for r in ivf_search(index, qvec, k=10, nprobe=1).collect()}
    recall = len(bf & ivf1) / len(bf)
    return spark.createDataFrame(
        [
            (
                int(stats["n_centroids"]),
                int(stats["min_leaf"]),
                int(stats["max_leaf"]),
                int(stats["n_assigned"]),
                float(round(recall, 4)),
            )
        ],
        "n_centroids long, min_leaf long, max_leaf long, n_assigned long, recall_at_10 double",
    )


@register(
    "ann_lsh_recall",
    oracle=None,  # recall against brute force: rows-only check
    doc="LSH multi-probe recall@10 vs brute force at radius 0 and 1 "
    "(plans/lsh.lsh_search probe_radius) - quality metric for the ANN path",
)
def q_ann_lsh_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec(spark, sf_dir)
    # bucket the corpus once for both probe radii (the bucket-on-write
    # shape: at scale _bucket is a stored column, never recomputed)
    bucketed = _lsh_bucketed_cached(spark, sf_dir)
    # both radii AND the brute-force ground truth in ONE job: tier rows
    # by bucket distance to the query's bucket (0 = same bucket, 1 =
    # Hamming-1 neighbor, 2 = everything else), take per-tier top-k with
    # one window, merge prefix-unions driver-side — radius 0's top-k =
    # tier-0's; radius 1's = top-k of tiers {0,1}; brute force = top-k
    # of all tiers (exact: a prefix-union's top-k is contained in the
    # union of per-tier top-ks).
    from go_vectorsearch_spark.operators.search import score_cosine

    qb = LSH.bucket_of(list(qvec), _LSH_PLANES_SMALL)
    ring1 = [
        b
        for b in LSH._hamming_neighbors(qb, len(_LSH_PLANES_SMALL), 1)
        if b != qb
    ]
    tiered = score_cosine(bucketed, qvec, "embedding").withColumn(
        "_tier",
        F.when(F.col("_bucket") == qb, F.lit(0))
        .when(F.col("_bucket").isin(ring1), F.lit(1))
        .otherwise(F.lit(2)),
    )
    # (round-6 desc, id asc) inside _per_tier_topk — brute_force_topk's
    # EXACT tie-break. Raw double ordering would diverge from the shared
    # ground-truth cache at a rounded tie on the k boundary, making the
    # recall numbers depend on which diagnostic ran first.
    rows = _per_tier_topk(tiered, "_tier", TOPK_K).collect()

    def topk_thru(max_tier: int) -> set:
        cand = [(r["score"], r["vec_id"]) for r in rows if r["_tier"] <= max_tier]
        cand.sort(key=lambda t: (-t[0], t[1]))
        return {v for _, v in cand[:TOPK_K]}

    bf = frozenset(topk_thru(2))
    # same ranking brute_force_topk would produce (unique vec_id, same
    # tie-break) — seed the shared ground-truth cache for the IVF sweeps
    _session_cache(spark, "_gvs_bf_cache").setdefault((sf_dir, TOPK_K), bf)
    out = []
    for radius in (0, 1):
        got = topk_thru(radius)
        out.append((radius, float(round(len(bf & got) / len(bf), 4))))
    return spark.createDataFrame(out, "probe_radius int, recall_at_10 double")


@register(
    "ivf_recall_sweep",
    oracle=None,  # recall against brute force: rows-only check
    doc="IVF quality/cost trade: recall@10 vs brute force at nprobe "
    "1/2/4/all on the cached index - the engine's accuracy dial "
    "(reference default nprobe=1, server/search.go:118-122)",
)
def q_ivf_recall_sweep(spark, sf_dir):
    from go_vectorsearch_spark.operators.search import score_cosine
    from go_vectorsearch_spark.plans.ivf import nearest_centroids

    qvec = _qvec(spark, sf_dir)
    index = _ivf_index(spark, sf_dir)
    # one driver-side centroid ranking serves every probe width (each
    # width's probe set is a prefix of it); the sweep itself is ONE job:
    # tag every row with its centroid's tier (= smallest probe width
    # containing it), take per-tier top-k with a single window, and merge
    # prefix-unions driver-side — exact, because width n's top-k is
    # contained in the union of the per-tier top-ks with tier <= n.
    ranked = nearest_centroids(index.centroids, qvec, 2**31 - 1)
    bf = _bf_ids(spark, sf_dir, TOPK_K)
    probes = sorted({1, 2, 4, len(ranked)})
    tier_of: dict[int, int] = {}
    for pos, cid in enumerate(ranked, start=1):
        tier_of[cid] = next(p for p in probes if pos <= p)
    tier_map = F.create_map(
        *[F.lit(x) for kv in tier_of.items() for x in kv]
    )
    scored = score_cosine(index.assigned, qvec, "embedding").withColumn(
        "_tier", tier_map[F.col("centroid_id")]
    )
    # brute_force_topk's (round-6 desc, id asc) tie-break inside
    # _per_tier_topk — see q_ann_lsh_recall: with raw ordering the
    # nprobe=all row could report < 1.0 on a rounded tie at the k
    # boundary
    rows = _per_tier_topk(scored, "_tier", TOPK_K).collect()
    out = []
    for n in probes:
        cand = [(r["score"], r["vec_id"]) for r in rows if r["_tier"] <= n]
        cand.sort(key=lambda t: (-t[0], t[1]))
        got = {v for _, v in cand[:TOPK_K]}
        out.append((int(n), float(round(len(bf & got) / len(bf), 4))))
    return spark.createDataFrame(out, "nprobe int, recall_at_10 double")


def _pq_cached(spark, sf_dir):
    """(codebooks, coded-frame) for the PQ family, cached per corpus —
    the codes column is a write-once stored column at scale (like the
    IVF assignment and LSH bucket), so its one-time encode is billed to
    bench's ``ann_pq_encode_build`` entry, not to the search query."""
    cache = _session_cache(spark, "_gvs_pq_cache")
    if sf_dir not in cache:
        from pyspark import StorageLevel

        from go_vectorsearch_spark.plans.pq import encode_pq, train_pq

        emb = _t(spark, sf_dir, "embeddings")
        books = train_pq(emb, m=16, k_sub=32, sample_size=5000)
        # codes stored WITH the IVF assignment's centroid_id — the
        # write-time layout ivfpq_search partition-prunes on; the extra
        # column is inert for plain ADC search
        assign = _ivf_index(spark, sf_dir).assigned.select(
            "vec_id", "centroid_id"
        )
        from go_vectorsearch_spark.sources.tables import spread

        # spread BEFORE the encode (r14): the sf parquet is one split,
        # so the un-spread store persisted as ONE partition and every
        # consumer (ADC scans, the rerank="all" exactness anchor) ran
        # single-task regardless of core count — the r13 verdict's
        # "prove it parallelizes" ask. At real scale the input has
        # thousands of splits and spread() is a plan-inspection no-op.
        coded = (
            encode_pq(spread(emb), books)
            .join(assign, "vec_id")
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        coded.count()
        cache[sf_dir] = (books, coded)
    return cache[sf_dir]


@register(
    "ann_pq_search",
    oracle=None,  # PQ is lossy: no SQL twin; quality bar is pytest
    # recall assertions + the exact re-rank stage (tests/test_pq.py)
    doc="Product-quantization ANN: 16x32 sub-codebooks (64 f32 dims -> "
    "16 B/vector), codegen'd ADC scan (per-query LUT folded into the "
    "plan), exact cosine re-rank of top-50 (plans/pq.pq_search; "
    "compression lineage: compute/quantization.go:71-102 stores 1 B/dim, "
    "PQ is the next step at the 100 TB point)",
)
def q_ann_pq_search(spark, sf_dir):
    from go_vectorsearch_spark.plans.pq import pq_search

    books, coded = _pq_cached(spark, sf_dir)
    qvec = _qvec(spark, sf_dir)
    res = pq_search(coded, books, qvec, k=TOPK_K, rerank=50)
    return res.select("vec_id", F.round("score", 6).alias("score"))


def _pca_cached(spark, sf_dir):
    """(model, projected-frame) for the PCA family, cached per corpus —
    like the PQ codes, the projected column is write-once at scale; the
    fit + projection materialization bills to bench's
    ``pca_project_build`` entry, not to the search query."""
    cache = _session_cache(spark, "_gvs_pca_cache")
    if sf_dir not in cache:
        from pyspark import StorageLevel

        from go_vectorsearch_spark.plans.pca import fit_pca, project_pca

        from go_vectorsearch_spark.sources.tables import spread

        emb = _t(spark, sf_dir, "embeddings")
        # center=False: the reduced vectors feed cosine scoring (see
        # plans/pca.py — uncentered projection preserves inner products
        # exactly at k = d); k = 16 of 64 dims, the 4x scan-width win.
        # spread: the single-split sf parquet otherwise persists the
        # projection as ONE partition and every search runs single-task
        # (no-op at real scale — see _pq_cached)
        model = fit_pca(emb, k=16, center=False)
        proj = (
            project_pca(spread(emb.select("vec_id", "embedding")), model)
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        proj.count()
        cache[sf_dir] = (model, proj)
    return cache[sf_dir]


@register(
    "ann_pca_rerank",
    oracle=None,  # lossy subspace shortlist: no SQL twin; quality bar
    # is the pytest suite (exact at k=d uncentered, recall at k<d)
    doc="PCA-compressed ANN: one-pass exact covariance fit (mergeable "
    "(n, Σx, ΣxᵀX) partials), 64->16-dim Arrow-batched projection, "
    "reduced-space cosine shortlist (4x narrower scan) + exact cosine "
    "re-rank of the shortlist only (plans/pca.py; the dimension-axis "
    "complement of the reference's value-axis 8-bit quantization, "
    "compute/quantization.go:71-102)",
)
def q_ann_pca_rerank(spark, sf_dir):
    from go_vectorsearch_spark.plans.pca import pca_search_rerank

    model, proj = _pca_cached(spark, sf_dir)
    qvec = _qvec(spark, sf_dir)
    res = pca_search_rerank(proj, qvec, model, k_results=TOPK_K, shortlist_mult=4)
    return res.select("vec_id", F.round("score", 6).alias("score"))


def _pca_exact_cached(spark, sf_dir):
    """k = d uncentered model + projection — the PCA family's zero-loss
    anchor. An uncentered full-rank fit is an orthogonal rotation, which
    preserves dots AND norms, so the reduced-space cosine ranking equals
    the full-space ranking bit-for-bit (plans/pca.py module doc). Cached
    and billed like _pca_cached (bench ``pca_exact_build``)."""
    cache = _session_cache(spark, "_gvs_pca_exact_cache")
    if sf_dir not in cache:
        from pyspark import StorageLevel

        from go_vectorsearch_spark.plans.pca import fit_pca, project_pca

        from go_vectorsearch_spark.sources.tables import spread

        emb = _t(spark, sf_dir, "embeddings")
        d = len(_qvec(spark, sf_dir))
        model = fit_pca(emb, k=d, center=False)
        # spread as in _pca_cached: one-split input would pin the k=d
        # exactness anchor to a single task at any core count
        proj = (
            project_pca(spread(emb.select("vec_id", "embedding")), model)
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        proj.count()
        cache[sf_dir] = (model, proj)
    return cache[sf_dir]


@register(
    "ann_pca_exact",
    oracle=COSINE_TOPK_ORACLE,
    doc="PCA exactness anchor (rotated into the window r8): the SAME "
    "two-stage reduced-shortlist -> exact-rerank plan as "
    "ann_pca_rerank, run at k = d uncentered with shortlist_mult = 1 "
    "(plans/pca.pca_search_rerank) — an orthogonal rotation preserves "
    "the cosine order, so the result must hash-match the brute-force "
    "top-k oracle exactly; pins tests/test_pca.py's exactness limit as "
    "a driver-checked row",
)
def q_ann_pca_exact(spark, sf_dir):
    from go_vectorsearch_spark.plans.pca import pca_search_rerank

    model, proj = _pca_exact_cached(spark, sf_dir)
    qvec = _qvec(spark, sf_dir)
    res = pca_search_rerank(proj, qvec, model, k_results=TOPK_K, shortlist_mult=1)
    return res.select("vec_id", F.round("score", 6).alias("score"))


# Demoted parity (tests/test_demoted_parity.py): the batched IVF search
# at nprobe=all must reproduce the per-query brute force exactly — the
# batch twin of the `ivf_search_exact` guarantee, pinned at the same
# DuckDB bar. Ranking key matches brute_force_topk: (round(score, 6)
# desc, id asc).
IVF_BATCH_PROBE_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.q_id, e.vec_id,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS sim
  FROM embeddings e CROSS JOIN q
)
SELECT q_id, vec_id, round(sim, 6) AS score
FROM (SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY round(sim, 6) DESC, vec_id ASC) AS rn
      FROM s)
WHERE rn <= 3
"""


def q_ivf_batch_probe_all(spark, sf_dir):
    """Batched IVF search, nprobe=all ≡ per-query brute force
    (plans/ivf.ivf_search_batch; reference serves one query per request,
    server/search.go:118-122 — the batch shape is the Spark-native
    extension)."""
    from go_vectorsearch_spark.plans.ivf import ivf_search_batch

    index = _ivf_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    qs = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .collect()
    ]
    nprobe = _ivf_nprobe_all(spark, sf_dir)
    res = ivf_search_batch(index, qs, k=3, nprobe=nprobe)
    return res.select("q_id", "vec_id", F.round("score", 6).alias("score"))


# dedup_semantic's DuckDB twin (rotated INTO the window r13 — the last
# LLM-pipeline family member without a driver-proved row; slot ceded by
# topk_dedup_customer). The greedy min-id elimination is inherently
# sequential per cluster, so the twin carries the kept set as a LIST
# column through a recursive CTE — one state row per (cluster, step) —
# against neighbor lists prebuilt OUTSIDE the recursion:
#   * e: L2-normalized vectors + a deterministic derived cluster
#     (vec_id % 8) both engines compute identically — the clustering is
#     an INPUT of the operator (the Engine composes it with the IVF
#     assignment; an iterative k-means is not SQL-re-derivable, the
#     _bp_corpus derived-fixture precedent applies);
#   * nbrs: per row, its SMALLER-id qualifying neighbors (cos >=
#     threshold) sorted by (cos DESC, id ASC) — the greedy only ever
#     reads the best QUALIFYING kept similarity, so sub-threshold pairs
#     never enter the recursion (output-bounded, the hot-cap
#     discipline);
#   * greedy: step k decides each cluster's (k+1)-th row purely with
#     list expressions (list_filter against the kept set, element 1 =
#     the argmax by the prebuilt sort) — NO LATERAL/aggregate inside
#     the recursive term (DuckDB 1.0 computes a LATERAL-in-recursion
#     nondeterministically under multithreading; found while building
#     this twin, pinned by tests/test_parity.py).
_SEM_NORM = (
    "list_transform(embedding::DOUBLE[], x -> x / "
    "CASE WHEN sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))) = 0 "
    "THEN 1.0 ELSE sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))) END)"
)

DEDUP_SEMANTIC_ORACLE = f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT vec_id AS id, vec_id % 8 AS cl, {_SEM_NORM} AS v,
         row_number() OVER (PARTITION BY vec_id % 8 ORDER BY vec_id) AS rn
  FROM embeddings
),
nbrs AS MATERIALIZED (
  SELECT id_i, list(struct_pack(j := id_j, c := c) ORDER BY c DESC, id_j ASC) AS nb
  FROM (
    SELECT a.id AS id_i, b.id AS id_j,
           list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) AS c
    FROM e a JOIN e b ON a.cl = b.cl AND b.rn < a.rn
  ) WHERE c >= 0.4
  GROUP BY id_i
),
en AS MATERIALIZED (
  SELECT e.id, e.cl, e.rn, coalesce(n.nb, []) AS nb
  FROM e LEFT JOIN nbrs n ON n.id_i = e.id
),
greedy AS (
  SELECT cl, rn, id,
         TRUE AS keep, NULL::BIGINT AS dup_of, NULL::DOUBLE AS sim,
         [id] AS kept_ids
  FROM en WHERE rn = 1
  UNION ALL
  SELECT cl, rn, id,
         best IS NULL, best.j, best.c,
         CASE WHEN best IS NULL THEN list_append(kept_ids, id) ELSE kept_ids END
  FROM (
    SELECT en.cl, en.rn, en.id, g.kept_ids,
           list_filter(en.nb, x -> list_contains(g.kept_ids, x.j))[1] AS best
    FROM greedy g JOIN en ON en.cl = g.cl AND en.rn = g.rn + 1
  )
)
SELECT id AS vec_id, cl AS centroid_id, keep, dup_of,
       round(sim, 6) AS max_kept_sim
FROM greedy
"""


@register(
    "dedup_semantic",
    oracle=DEDUP_SEMANTIC_ORACLE,
    doc="SemDeDup-style semantic dedup (operators/dedup.semantic_dedup; "
    "Abbas et al. 2023, arXiv:2303.09540): greedy min-id near-dup "
    "removal within each cluster — survivors pairwise < threshold, each "
    "duplicate records its kept dup_of and similarity. Windowed over a "
    "deterministic derived cluster column (the clustering is the "
    "operator's input contract; dedup_semantic_ivf drives the "
    "IVF-assignment composition); DuckDB twin replays the greedy "
    "sequence with a recursive CTE carrying the kept set as a list",
)
def q_dedup_semantic(spark, sf_dir):
    from go_vectorsearch_spark.operators import dedup as _DD

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") % 8).alias("centroid_id")
    )
    out = _DD.semantic_dedup(emb, threshold=0.4)
    return out.select(
        "vec_id",
        "centroid_id",
        "keep",
        "dup_of",
        F.round("max_kept_sim", 6).alias("max_kept_sim"),
    )


@register(
    "dedup_semantic_ivf",
    oracle=None,  # k-means-cluster dependent: rows-only check; the
    # greedy semantics are driver-proved by dedup_semantic above, and
    # this composition (cluster = the ANN index's own assignment, so
    # the clustering cost is shared) is pinned by
    # tests/test_dedup_text.py invariants. Registered in the no-oracle
    # TAIL: the driver's correctness window covers the first 50
    # entries, which must stay the 50 oracle ones.
    doc="SemDeDup over the IVF build's k-means assignment "
    "(operators/dedup.semantic_dedup composed with plans/ivf."
    "build_index — the paper's cluster-then-dedup recipe with the "
    "clustering cost shared with the ANN index)",
)
def q_dedup_semantic_ivf(spark, sf_dir):
    from go_vectorsearch_spark.operators import dedup as _DD

    index = _ivf_index(spark, sf_dir)
    out = _DD.semantic_dedup(index.assigned, threshold=0.4)
    return out.select(
        "vec_id",
        "centroid_id",
        "keep",
        "dup_of",
        F.round("max_kept_sim", 6).alias("max_kept_sim"),
    )


@register(
    "ann_ivfpq_search",
    oracle=None,  # lossy two-level ANN: no SQL twin; pinned by pytest
    # brute-force equality at nprobe=all + monotone recall
    # (tests/test_pq.py). Tail-registered like every no-oracle entry.
    doc="IVF-PQ: probe-pruned ADC scan + exact re-rank over codes stored "
    "with their centroid assignment (plans/pq.ivfpq_search — the "
    "two-level FAISS IndexIVFPQ architecture; probe filter hits the "
    "codes scan directly, so I/O shrinks with nprobe at the stored "
    "partitionBy(centroid_id) layout)",
)
def q_ann_ivfpq_search(spark, sf_dir):
    from go_vectorsearch_spark.plans.pq import ivfpq_search

    index = _ivf_index(spark, sf_dir)
    books, coded = _pq_cached(spark, sf_dir)
    qvec = _qvec(spark, sf_dir)
    res = ivfpq_search(index, coded, books, qvec, k=TOPK_K, nprobe=2, rerank=50)
    return res.select("vec_id", F.round("score", 6).alias("score"))


# IVF-PQ exactness anchor, rotated INTO the driver window r9 (slot
# ceded by cosine_topk_quantized): IVF-PQ at nprobe = all lists with
# full exact re-rank degenerates to brute force, so it must reproduce
# the cosine_topk oracle — the PQ family's analog of the windowed
# ann_pca_exact, closing the last ANN family without a driver-proved
# exactness row.
ANN_IVFPQ_EXACT_ORACLE = COSINE_TOPK_ORACLE


@register(
    "ann_ivfpq_exact",
    oracle=ANN_IVFPQ_EXACT_ORACLE,
    doc="IVF-PQ exactness anchor: nprobe='all' + rerank='all' is the "
    "architecture's zero-loss limit — identity probe filter, sort-free "
    "exact re-rank of the whole coded store (the ADC pass is skipped: "
    "its order cannot affect a full re-rank; approximation quality is "
    "pinned by the recall tests). Hash-checked against the cosine_topk "
    "oracle, proving the coded store and the rerank stage's scoring/"
    "order conventions round-trip the corpus exactly — the PQ family's "
    "analog of ann_pca_exact (plans/pq.ivfpq_search)",
)
def q_ann_ivfpq_exact(spark, sf_dir):
    from go_vectorsearch_spark.plans.pq import ivfpq_search

    index = _ivf_index(spark, sf_dir)
    books, coded = _pq_cached(spark, sf_dir)
    qvec = _qvec(spark, sf_dir)
    # "all"/"all": the identity probe filter and the sort-free full
    # re-rank — no centroid-count or corpus-count job, no all-ids isin
    # literal (at 10^6 centroids that literal is the driver-side smell
    # the engine forbids elsewhere)
    res = ivfpq_search(
        index, coded, books, qvec, k=TOPK_K, nprobe="all", rerank="all"
    )
    return res.select("vec_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Full-text + hybrid retrieval (SURVEY §8 r4): BM25 over the documents
# table, the bucketed stored-postings probe, late-interaction MaxSim,
# and reciprocal-rank-fusion hybrid search. The reference is
# vector-only; these are the retrieval modes a user of a 100 TB corpus
# needs next to it (lexical recall, multi-vector rerank, fusion).
# Registered AFTER the 50-entry driver correctness window — the first
# 50 entries must stay the original 50 oracle ones — but each carries
# a full DuckDB oracle anyway and is pinned at the same parity bar by
# tests/test_fulltext.py.
# ---------------------------------------------------------------------------

_BM25_QUERY = "spark shuffle hash table"

_QVECS_CACHE: dict[tuple, list] = {}

# the BM25 cosine/idf constants used by every fulltext entry (k1=1.2,
# b=0.75 — the Robertson/Sparck-Jones defaults the operators also use)
_BM25_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
), stats AS (
  -- n counts only docs with >= 1 token (build_bm25_index semantics:
  -- token-less docs back no postings, so they are not corpus stats)
  SELECT count(*) FILTER (len(toks) > 0)::DOUBLE AS n,
         sum(len(toks))::DOUBLE
           / greatest(count(*) FILTER (len(toks) > 0), 1) AS avgdl
  FROM toks
), posts AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
), tf AS (
  SELECT term, doc_id, dl, count(*) AS tf
  FROM posts WHERE term IN ('hash', 'shuffle', 'spark', 'table')
  GROUP BY term, doc_id, dl
), idf AS (
  SELECT term,
         ln(1 + ((SELECT n FROM stats) - count(*) + 0.5) / (count(*) + 0.5))
           AS idf
  FROM tf GROUP BY term
)
SELECT tf.doc_id,
       round(sum(idf.idf * tf.tf * (1.2 + 1)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                   / (SELECT avgdl FROM stats)))), 6) AS score
FROM tf JOIN idf USING (term)
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT 10
"""


def _bm25_cached(spark, sf_dir: str):
    """Session-cached BM25 index with materialized postings — the
    serving analog of the reference's cached centroid set
    (cache/middleware.go:18-163): the index is built once per corpus,
    every query is then a pruned probe. At 100 TB the postings live in
    the stored bucketed layout instead (see _bm25_store_path)."""
    cache = _session_cache(spark, "_gvs_bm25_cache")
    if sf_dir not in cache:
        from go_vectorsearch_spark.operators.fulltext import build_bm25_index

        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        cache[sf_dir] = build_bm25_index(docs, persist=True)
    return cache[sf_dir]


def _bm25_store_path(spark, sf_dir: str) -> str:
    """One-time bucketed postings write (term-hash partitionBy), the
    at-scale layout; billed to its own bench entry like the IVF store."""
    cache = _session_cache(spark, "_gvs_bm25_store_cache")
    if sf_dir not in cache:
        import tempfile

        from go_vectorsearch_spark.operators.fulltext import write_postings

        path = tempfile.mkdtemp(prefix="spark_graft_bm25_store_")
        write_postings(_bm25_cached(spark, sf_dir), path, n_buckets=16)
        cache[sf_dir] = path
    return cache[sf_dir]


def _qvecs(spark, sf_dir: str, ids: tuple = (0, 1, 2)) -> list:
    """The multi-vector query set (stored embeddings of the given
    vec_ids) — one bounded driver collect per (sf_dir, ids)."""
    key = (sf_dir, ids)
    if key not in _QVECS_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        _QVECS_CACHE[key] = [
            list(r["embedding"])
            for r in emb.filter(F.col("vec_id").isin(list(ids)))
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        ]
    return _QVECS_CACHE[key]


@register(
    "fulltext_bm25",
    oracle=_BM25_ORACLE,
    doc="BM25 top-k over the documents table (operators/fulltext.py): "
    "postings = one explode + groupBy pass with dl denormalized onto "
    "every row, query path = one term-pruned scan + groupBy(doc).sum + "
    "TakeOrdered — no join. Okapi k1=1.2 b=0.75, (round-6 desc, id asc) "
    "total order matching the engine's search rule",
)
def q_fulltext_bm25(spark, sf_dir):
    from go_vectorsearch_spark.operators.fulltext import bm25_search

    index = _bm25_cached(spark, sf_dir)
    res = bm25_search(index, _BM25_QUERY, k=10)
    return res.select("doc_id", F.round("score", 6).alias("score"))


@register(
    "fulltext_bm25_stored",
    oracle=_BM25_ORACLE,
    doc="BM25 over the STORED bucketed postings layout "
    "(fulltext.bm25_search_stored): term-hash partitionBy, the query "
    "scans only its terms' buckets (PartitionFilters on _tb, "
    "tests/test_fulltext.py pins the pruned plan) — the inverted "
    "index's seek as directory pruning; must equal fulltext_bm25",
)
def q_fulltext_bm25_stored(spark, sf_dir):
    from go_vectorsearch_spark.operators.fulltext import bm25_search_stored

    res = bm25_search_stored(
        spark, _bm25_store_path(spark, sf_dir), _BM25_QUERY, k=10
    )
    return res.select("doc_id", F.round("score", 6).alias("score"))


@register(
    "fulltext_maxsim",
    oracle="""
WITH q AS (SELECT
  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0) AS q0,
  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 1) AS q1,
  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 2) AS q2),
per AS (
  SELECT e.label,
         max(list_sum(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * q.q0[i]))
             / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(q.q0, x -> x * x))))) AS m0,
         max(list_sum(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * q.q1[i]))
             / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(q.q1, x -> x * x))))) AS m1,
         max(list_sum(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * q.q2[i]))
             / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(q.q2, x -> x * x))))) AS m2
  FROM embeddings e, q
  GROUP BY e.label
)
SELECT label, round(m0 + m1 + m2, 6) AS score
FROM per
ORDER BY score DESC, label ASC
LIMIT 10
""",
    doc="Late-interaction MaxSim (ColBERT rule, Khattab & Zaharia 2020) "
    "over (label = document, chunk vectors): each request-sized query "
    "vector folds into codegen as a literal score column, ONE "
    "groupBy(doc) computes every per-query max map-side — one scan, one "
    "shuffle regardless of nq (plan pinned by tests/test_fulltext.py). "
    "The reference's per-document max over chunk scores "
    "(server/search.go:259-268) is MaxSim with one query vector",
)
def q_fulltext_maxsim(spark, sf_dir):
    from go_vectorsearch_spark.operators.search import maxsim_topk

    # NO spread (r14, measured): the per-doc max is a map-side partial
    # aggregate computed inside the scan stage, so the exchange a
    # spread adds costs more than the fold it parallelizes at this SF
    # (min-of-3 A/B: 0.73 vs 0.62 s) and is a no-op at real scale —
    # see q_cosine_topk
    emb = _t(spark, sf_dir, "embeddings")
    res = maxsim_topk(emb, _qvecs(spark, sf_dir), k=10, doc_col="label")
    return res.select("label", F.round("score", 6).alias("score"))


@register(
    "fulltext_hybrid_rrf",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
), stats AS (
  -- n counts only docs with >= 1 token (build_bm25_index semantics:
  -- token-less docs back no postings, so they are not corpus stats)
  SELECT count(*) FILTER (len(toks) > 0)::DOUBLE AS n,
         sum(len(toks))::DOUBLE
           / greatest(count(*) FILTER (len(toks) > 0), 1) AS avgdl
  FROM toks
), posts AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
), tf AS (
  SELECT term, doc_id, dl, count(*) AS tf
  FROM posts WHERE term IN ('hash', 'shuffle', 'spark', 'table')
  GROUP BY term, doc_id, dl
), idf AS (
  SELECT term,
         ln(1 + ((SELECT n FROM stats) - count(*) + 0.5) / (count(*) + 0.5))
           AS idf
  FROM tf GROUP BY term
), lex AS (
  SELECT tf.doc_id,
         round(sum(idf.idf * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                     / (SELECT avgdl FROM stats)))), 6)
           AS score
  FROM tf JOIN idf USING (term)
  GROUP BY tf.doc_id
  ORDER BY score DESC, tf.doc_id ASC
  LIMIT 20
), q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT e.vec_id AS doc_id,
         round(
           list_sum(list_transform(generate_series(1, len(e.embedding)),
                                   i -> e.embedding[i]::DOUBLE * q.qv[i]))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6) AS score
  FROM embeddings e, q
  ORDER BY score DESC, e.vec_id ASC
  LIMIT 20
), ranked AS (
  SELECT doc_id,
         1.0 / (60 + row_number() OVER (ORDER BY score DESC, doc_id ASC))
           AS rrf
  FROM lex
  UNION ALL
  SELECT doc_id,
         1.0 / (60 + row_number() OVER (ORDER BY score DESC, doc_id ASC))
           AS rrf
  FROM sem
)
SELECT doc_id, round(sum(rrf), 6) AS score
FROM ranked
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
""",
    doc="Hybrid retrieval: BM25 top-20 + cosine top-20 fused by "
    "reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR 2009, "
    "fulltext.rrf_fuse) — each bounded ranking collapses to one "
    "array_sort aggregate (rank = position, no Window), fused score = "
    "sum of 1/(60+rank). The lexical-recall complement the "
    "vector-only reference lacks",
)
def q_fulltext_hybrid_rrf(spark, sf_dir):
    from go_vectorsearch_spark.operators.fulltext import bm25_search, rrf_fuse
    from go_vectorsearch_spark.operators.search import brute_force_topk

    index = _bm25_cached(spark, sf_dir)
    lexical = bm25_search(index, _BM25_QUERY, k=20)
    # NO spread on the semantic leg (r14, measured): same trade as
    # q_cosine_topk — the leg is a map-side-pruned top-20
    emb = _t(spark, sf_dir, "embeddings")
    semantic = brute_force_topk(emb, _qvec(spark, sf_dir), 20).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    fused = rrf_fuse([lexical, semantic], k=10, c=60)
    return fused.select("doc_id", F.round("score", 6).alias("score"))


@register(
    "ivf_search_filtered",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                                 i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS score
FROM embeddings e, q
WHERE e.label % 7 = 3
ORDER BY score DESC, e.vec_id ASC
LIMIT {TOPK_K}
""",
    doc="Filtered vector search: a scalar metadata predicate composed "
    "with the IVF probe as a PRE-filter (plans/ivf.ivf_search where=...) "
    "— the predicate applies to the probed lists before scoring so the "
    "top-k always holds k matching rows; probe isin AND predicate both "
    "reach the stored layout's parquet scan. nprobe=all here, so the "
    "result is exact filtered search (the oracle case). The reference's "
    "category scoping (server/search.go:229-233) is this shape with "
    "where = (category_id = ?)",
)
def q_ivf_search_filtered(spark, sf_dir):
    from go_vectorsearch_spark.plans.ivf import ivf_search

    qvec = _qvec(spark, sf_dir)
    index = _ivf_index(spark, sf_dir)
    nprobe = _ivf_nprobe_all(spark, sf_dir)
    res = ivf_search(
        index, qvec, k=TOPK_K, nprobe=nprobe, where=(F.col("label") % 7 == 3)
    )
    return res.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "quality_model_features",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text,
         {_SQL_TOKENS} AS toks
  FROM documents
)
SELECT doc_id,
       round(CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                  / length(text)::DOUBLE END, 6) AS f_alpha_ratio,
       round(CASE WHEN len(toks) = 0 THEN 0.0
             ELSE len(list_filter(toks, tok -> list_contains([{_SQL_STOPLIST}], tok)))::DOUBLE
                  / len(toks)::DOUBLE END, 6) AS f_stop_ratio,
       round(CASE WHEN len(toks) = 0 THEN 0.0
             ELSE list_sum(list_transform(toks, tok -> length(tok)))::DOUBLE
                  / len(toks)::DOUBLE END, 6) AS f_mean_token_len,
       len(toks)::DOUBLE AS f_n_tokens,
       length(text)::DOUBLE AS f_n_chars,
       round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE
             / greatest(length(text), 1)::DOUBLE, 6) AS f_upper_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             / greatest(length(text), 1)::DOUBLE, 6) AS f_digit_ratio
FROM t
""",
    doc="The trainable quality classifier's feature extraction "
    "(operators/quality_model.quality_features): 7 per-document "
    "statistics in one staged-token projection pass — deterministic "
    "codegen'd expressions, so the model's INPUT is oracle-checkable "
    "even though the L-BFGS fit itself is pytest-pinned "
    "(tests/test_quality_model.py)",
)
def q_quality_model_features(spark, sf_dir):
    from go_vectorsearch_spark.operators.quality_model import quality_features

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features(docs)
    return feats.select(
        "doc_id",
        F.round("f_alpha_ratio", 6).alias("f_alpha_ratio"),
        F.round("f_stop_ratio", 6).alias("f_stop_ratio"),
        F.round("f_mean_token_len", 6).alias("f_mean_token_len"),
        "f_n_tokens",
        "f_n_chars",
        F.round("f_upper_ratio", 6).alias("f_upper_ratio"),
        F.round("f_digit_ratio", 6).alias("f_digit_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-6 rotation: the r5 pipeline operators (content-defined chunking,
# BPE tokenizer, n-gram LM perplexity, token-budget sampling) enter the
# driver's 50-entry CORRECTNESS window with full DuckDB oracles; four
# long-stable extension entries (events_sessionize, sample_stratified,
# text_fingerprint, dedup_simhash_docs) ceded their slots and keep their
# identical parity bar in tests/test_demoted_parity.py.
# ---------------------------------------------------------------------------

# CDC chunk parameters for the registry entry: sized to the sf0.01
# documents table (48-553 chars) so chunking yields ~6 chunks/doc and a
# real duplicated-passage signal (69/500 docs share chunks).
CDC_MIN, CDC_AVG, CDC_MAX = 16, 32, 128


def _cdc_oracle() -> str:
    """DuckDB twin of cdc_chunks + cdc_dup_stats.

    The gear rolling hash looks sequential (h = (h<<1 + gear[b]) mod
    2^64 with resets at every cut), but the boundary test only reads
    ``h mod avg_size``: with avg_size=32 the low 5 bits of h depend on
    the last 5 bytes ONLY (older bytes arrive shifted by >=2^5 ≡ 0 mod
    32), and eligibility requires >=min_size=16 bytes since the reset,
    so the reset state never reaches the masked bits. Boundary
    candidacy is therefore position-local and precomputable as a list
    expression; the remaining walk (min_size/max_size/forced-cut rules)
    recurses at CHUNK granularity, not byte granularity. The gear table
    is embedded mod 32 — the only bits the mask can see.

    The oracle works in characters where the engine works in UTF-8
    bytes; the sf tables are pure ASCII (verified) so the two coincide,
    and the multi-byte snap path is covered by tests/test_cdc.py."""
    from go_vectorsearch_spark.operators.cdc import _GEAR

    g32 = [v % 32 for v in _GEAR]
    return f"""
WITH RECURSIVE
g(t) AS (SELECT {g32}),
pre AS MATERIALIZED (
  SELECT doc_id, coalesce(text,'') AS text, length(coalesce(text,'')) AS n,
         list_transform(range(1, length(coalesce(text,''))+1),
                        p -> ascii(substring(coalesce(text,''), p::INT, 1))) AS bl
  FROM documents
),
cand AS MATERIALIZED (
  SELECT doc_id, text, n,
         CASE WHEN n >= 5 THEN
           list_filter(range(5, n+1), e ->
             (t[bl[e::INT]+1] + 2*t[bl[(e-1)::INT]+1] + 4*t[bl[(e-2)::INT]+1]
              + 8*t[bl[(e-3)::INT]+1] + 16*t[bl[(e-4)::INT]+1]) % 32 = 31)
         ELSE [] END AS cuts
  FROM pre, g
),
walk(doc_id, ix, s, e, n) AS (
  SELECT doc_id, 0, 0,
         CASE WHEN n = 0 THEN 0 ELSE
           least(coalesce(list_min(list_filter(cuts, c -> c >= {CDC_MIN})),
                 1073741824), {CDC_MAX}, n) END,
         n
  FROM cand
  UNION ALL
  SELECT w.doc_id, w.ix + 1, w.e,
         least(coalesce(list_min(list_filter(c.cuts, x -> x >= w.e + {CDC_MIN})),
               1073741824), w.e + {CDC_MAX}, w.n),
         w.n
  FROM walk w JOIN cand c ON c.doc_id = w.doc_id
  WHERE w.e < w.n
),
chunks AS MATERIALIZED (
  SELECT w.doc_id, (w.e - w.s) AS chunk_len,
         md5(substring(c.text, (w.s+1)::INT, (w.e - w.s)::INT)) AS chunk_hash
  FROM walk w JOIN cand c ON c.doc_id = w.doc_id
),
own AS (
  SELECT chunk_hash, min(doc_id) AS owner, count(*) AS copies
  FROM chunks GROUP BY chunk_hash
),
tagged AS (
  SELECT ch.doc_id, ch.chunk_len,
         CASE WHEN o.copies > 1 AND ch.doc_id <> o.owner THEN 1 ELSE 0 END AS is_dup
  FROM chunks ch JOIN own o ON o.chunk_hash = ch.chunk_hash
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(chunk_len)::BIGINT AS total_len,
       sum(is_dup)::BIGINT AS dup_chunks,
       sum(is_dup * chunk_len)::BIGINT AS dup_len,
       round(sum(is_dup * chunk_len)::DOUBLE /
             (CASE WHEN sum(chunk_len) > 0 THEN sum(chunk_len) ELSE 1 END), 6)
         AS dup_frac
FROM tagged GROUP BY doc_id
"""


@register(
    "cdc_dup_stats",
    oracle=_cdc_oracle(),
    doc="Sub-document dedup: content-defined chunking (FastCDC-style "
    "gear hash) + per-document duplicated-passage stats — narrow "
    "Arrow-batched chunker, two md5-groupBy shuffles of narrow rows "
    "(operators/cdc.py; the reference's Split is fixed-width, "
    "server/format.go:91-108, and misses shifted shared passages)",
)
def q_cdc_dup_stats(spark, sf_dir):
    from go_vectorsearch_spark.operators.cdc import cdc_chunks, cdc_dup_stats

    # single consumption since the r13 ownership-window restage (the
    # stats no longer join the chunk frame against its own aggregate),
    # so the chunker streams straight into the window — no persist, no
    # materialization job
    chunks = cdc_chunks(
        _t(spark, sf_dir, "documents"),
        min_size=CDC_MIN,
        avg_size=CDC_AVG,
        max_size=CDC_MAX,
    )
    return cdc_dup_stats(chunks)


BPE_N_MERGES = 60
EOW_SQL = "</w>"  # operators/bpe.EOW — end-of-word marker

# Greedy left-to-right application of one merge pair to a symbol list,
# as a pure list expression (no fold): for pair (a,b) with a != b the
# match positions can never overlap, so every candidate merges; for
# a == b candidates overlap only inside runs of `a`, where greedy takes
# every other one — position i merges iff its offset inside the maximal
# run of `a`s ending at it is even. `e.s` is the symbol list and `bg`
# the pair, both plain columns of the recursive term's FROM (DuckDB
# binds lambda captures of same-level columns, but not correlated outer
# columns — hence the GROUP-BY-shaped recursive term instead of a
# scalar subquery).
def _bpe_merge_cond(iv: str) -> str:
    return f"""(
  ({iv}) < len(e.s) AND e.s[({iv})::INT] = bg[1] AND e.s[(({iv})+1)::INT] = bg[2]
  AND (bg[1] <> bg[2]
       OR (({iv}) - 1 - coalesce(list_max(list_filter(range(1, {iv}),
             j -> e.s[j::INT] <> bg[1])), 0)) % 2 = 0)
)"""


def _bpe_oracle() -> str:
    """DuckDB twin of train_bpe + bpe_encode — training AND encoding in
    SQL, no constants imported from the Python learner.

    Training: single-row-state recursive CTE; each level picks the
    most-frequent adjacent pair (ties: lexicographically smallest, the
    learner's determinism rule) via a scalar subquery over the unnested
    vocab, then rebuilds the vocab with a GROUP BY over the unnest —
    aggregate-in-recursive-term is the shape DuckDB accepts where
    correlated lambdas are not. Encoding: per distinct word, a second
    recursion applies the lowest-rank applicable merge one at a time at
    the earliest position — exactly segment_word's loop."""
    return f"""
WITH RECURSIVE
toks AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')),
                 '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
hist AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(t) AS w FROM toks)
  GROUP BY w ORDER BY c DESC, w LIMIT 50000
),
rec(it, vocab, merges) AS (
  SELECT 0,
         (SELECT list({{'s': string_split(w, '') || ['{EOW_SQL}'], 'c': c}}) FROM hist),
         []::VARCHAR[][]
  UNION ALL
  SELECT step.it + 1,
         list({{'s': list_transform(
                  list_filter(range(1, len(e.s)+1),
                              i -> i = 1 OR NOT {_bpe_merge_cond("i-1")}),
                  i -> CASE WHEN {_bpe_merge_cond("i")}
                       THEN bg[1] || bg[2] ELSE e.s[i::INT] END),
               'c': e.c}}),
         any_value(step.merges) || [any_value(step.bg)]
  FROM (
    SELECT r.it, r.vocab, r.merges,
           (SELECT g FROM (
              SELECT [e2.s[i::INT], e2.s[(i+1)::INT]] AS g, sum(e2.c) AS pc
              FROM unnest(r.vocab) AS t2(e2), unnest(range(1, len(e2.s))) AS u(i)
              GROUP BY 1
            ) ORDER BY pc DESC, g LIMIT 1) AS bg
    FROM rec r WHERE r.it < {BPE_N_MERGES}
  ) AS step,
  unnest(step.vocab) AS t(e)
  WHERE step.bg IS NOT NULL
  GROUP BY step.it, step.bg
),
mt AS MATERIALIZED (SELECT merges FROM rec ORDER BY it DESC LIMIT 1),
words AS MATERIALIZED (SELECT DISTINCT unnest(t) AS w FROM toks),
seg(w, syms, it) AS (
  SELECT w, string_split(w, '') || ['{EOW_SQL}'], 0 FROM words
  UNION ALL
  SELECT s.w,
         list_slice(s.syms, 1, s.bi - 1)
           || [s.syms[s.bi::INT] || s.syms[(s.bi + 1)::INT]]
           || list_slice(s.syms, s.bi + 2, len(s.syms)),
         s.it + 1
  FROM (
    SELECT sg.w, sg.syms, sg.it,
           CASE WHEN list_min(list_filter(sg.ra, x -> x > 0)) IS NOT NULL
                THEN list_position(sg.ra, list_min(list_filter(sg.ra, x -> x > 0)))
           END AS bi
    FROM (
      SELECT g.w, g.syms, g.it,
             list_transform(range(1, len(g.syms)),
                i -> list_position(m.merges, [g.syms[i::INT], g.syms[(i+1)::INT]])) AS ra
      FROM seg g, mt m
    ) sg
  ) s
  WHERE s.bi IS NOT NULL
),
final AS (SELECT w, arg_max(syms, it) AS syms FROM seg GROUP BY w),
pos AS (
  SELECT doc_id, i AS pos, t[i::INT] AS w
  FROM toks, unnest(range(1, len(t)+1)) AS u(i)
),
enc AS (
  SELECT p.doc_id, flatten(list(f.syms ORDER BY p.pos)) AS tokens
  FROM pos p JOIN final f ON f.w = p.w
  GROUP BY p.doc_id
)
SELECT tk.doc_id,
       coalesce(len(e.tokens), 0)::INT AS n_tokens,
       -- outer coalesce: DuckDB's array_to_string([]) is NULL where
       -- Spark's concat_ws is '' — a token-less doc must hash md5('')
       md5(coalesce(array_to_string(coalesce(e.tokens, []), ' '), ''))
         AS tokens_md5
FROM toks tk LEFT JOIN enc e ON e.doc_id = tk.doc_id
"""


def _bpe_merges_cached(spark, sf_dir: str):
    cache = _session_cache(spark, "_gvs_bpe_cache")
    if sf_dir not in cache:
        from go_vectorsearch_spark.operators.bpe import train_bpe

        cache[sf_dir] = train_bpe(
            _t(spark, sf_dir, "documents"), n_merges=BPE_N_MERGES, max_words=50_000
        )
    return cache[sf_dir]


@register(
    "bpe_encode_docs",
    oracle=_bpe_oracle(),
    doc="BPE tokenizer train + encode (Sennrich 2016): corpus-scale "
    "word histogram (one explode+groupBy), driver-side merge learning "
    "over the bounded histogram, narrow Arrow-batched encode with the "
    "merge table in the closure (operators/bpe.py); the oracle "
    "re-derives the merges and re-encodes entirely in SQL. Output is "
    "scalar-only — the token sequence is fingerprinted as "
    "md5(space-joined tokens), which is sequence-sensitive and keeps "
    "the result canonicalizable (the driver's pandas sort cannot "
    "factorize array cells)",
)
def q_bpe_encode_docs(spark, sf_dir):
    from go_vectorsearch_spark.operators.bpe import bpe_encode

    docs = _t(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _bpe_merges_cached(spark, sf_dir))
    # Tokens are [a-z0-9]+ fragments plus the </w> marker — none contain
    # a space, so the space-join is an injective encoding of the sequence.
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(F.concat_ws(" ", "tokens")).alias("tokens_md5"),
    )


NGRAM_ORDER = 3
NGRAM_MAX_ENTRIES = 200_000  # >> the sf0.01 gram space: the top-k cut
# is a no-op on BOTH engines, so its tie-break semantics can't diverge


def _ngram_ppl_oracle() -> str:
    """DuckDB twin of train_ngram_lm + perplexity_score: per-order gram
    count CTEs (the trained model), then per-position stupid-backoff
    lookups as LEFT JOINs and an ORDER BY pos list_sum so float
    accumulation order matches the scorer's left-to-right loop.

    Grams are keyed as space-joined STRINGS, not lists (tokens are
    [a-z0-9]+ so the separator is unambiguous): DuckDB's hash join on
    LIST keys measured ~5x slower at sf0.1 — the oracle should be the
    engine's honest best, not a handicapped twin."""
    la = "log2(0.4)"  # BACKOFF_ALPHA
    return f"""
WITH
toks AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')),
                 '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
uni AS MATERIALIZED (
  SELECT g, count(*)::BIGINT AS c FROM (SELECT unnest(t) AS g FROM toks)
  GROUP BY g ORDER BY c DESC, g LIMIT {NGRAM_MAX_ENTRIES}
),
bi AS MATERIALIZED (
  SELECT g, count(*)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t)-1, 0)+1),
                  i -> t[i::INT] || ' ' || t[(i+1)::INT])) AS g FROM toks)
  GROUP BY g ORDER BY c DESC, g LIMIT {NGRAM_MAX_ENTRIES}
),
tri AS MATERIALIZED (
  SELECT g, count(*)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
                  i -> t[i::INT] || ' ' || t[(i+1)::INT] || ' ' || t[(i+2)::INT]))
           AS g FROM toks)
  GROUP BY g ORDER BY c DESC, g LIMIT {NGRAM_MAX_ENTRIES}
),
consts AS MATERIALIZED (
  SELECT (SELECT sum(len(t))::BIGINT FROM toks) AS tot,
         (SELECT count(*)::BIGINT FROM uni) AS nv
),
pos AS (
  SELECT doc_id, i AS pos, least(i, {NGRAM_ORDER}) AS glen,
         t[i::INT] AS w,
         CASE WHEN i >= 2 THEN t[(i-1)::INT] END AS p1,
         CASE WHEN i >= 3 THEN t[(i-2)::INT] END AS p2
  FROM toks, unnest(range(1, len(t)+1)) AS u(i)
),
lp AS (
  SELECT p.doc_id, p.pos,
    CASE
      WHEN p.glen >= 3 AND t3.c IS NOT NULL AND d3.c IS NOT NULL
        THEN log2(t3.c::DOUBLE / d3.c)
      WHEN p.glen >= 2 AND t2.c IS NOT NULL AND d2.c IS NOT NULL
        THEN log2(t2.c::DOUBLE / d2.c) + (p.glen - 2) * {la}
      ELSE log2((coalesce(u1.c, 0) + 1)::DOUBLE / (c.tot + c.nv + 1))
           + (p.glen - 1) * {la}
    END AS l
  FROM pos p
  CROSS JOIN consts c
  LEFT JOIN tri t3 ON p.glen >= 3 AND t3.g = p.p2 || ' ' || p.p1 || ' ' || p.w
  LEFT JOIN bi  d3 ON p.glen >= 3 AND d3.g = p.p2 || ' ' || p.p1
  LEFT JOIN bi  t2 ON p.glen >= 2 AND t2.g = p.p1 || ' ' || p.w
  LEFT JOIN uni d2 ON p.glen >= 2 AND d2.g = p.p1
  LEFT JOIN uni u1 ON u1.g = p.w
),
agg AS (
  SELECT doc_id, count(*) AS n, list_sum(list(l ORDER BY pos)) AS s
  FROM lp GROUP BY doc_id
)
SELECT tk.doc_id,
       coalesce(a.n, 0)::INT AS n_tokens,
       round(-a.s / a.n, 6) AS log2ppl
FROM toks tk LEFT JOIN agg a ON a.doc_id = tk.doc_id
"""


def _ngram_lm_cached(spark, sf_dir: str):
    cache = _session_cache(spark, "_gvs_ngram_cache")
    if sf_dir not in cache:
        from go_vectorsearch_spark.operators.ngram_lm import train_ngram_lm

        cache[sf_dir] = train_ngram_lm(
            _t(spark, sf_dir, "documents"),
            order=NGRAM_ORDER,
            max_entries=NGRAM_MAX_ENTRIES,
        )
    return cache[sf_dir]


@register(
    "ngram_perplexity",
    oracle=_ngram_ppl_oracle(),
    doc="CCNet-style n-gram LM perplexity: bounded stupid-backoff model "
    "trained by per-order gram groupBys, scored by a narrow "
    "Arrow-batched map with the model in the closure "
    "(operators/ngram_lm.py; Brants et al. 2007)",
)
def q_ngram_perplexity(spark, sf_dir):
    from go_vectorsearch_spark.operators.ngram_lm import perplexity_score

    docs = _t(spark, sf_dir, "documents")
    out = perplexity_score(docs, _ngram_lm_cached(spark, sf_dir))
    return out.select(
        "doc_id", "n_tokens", F.round("log2ppl", 6).alias("log2ppl")
    )


@register(
    "token_budget_sample",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         CAST(concat('0x', substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS addr,
         CASE lang WHEN 'en' THEN 4000 WHEN 'zh' THEN 1500 ELSE 2500 END AS budget
  FROM documents
),
c AS (
  SELECT *, sum(n_tok) OVER (
    PARTITION BY lang ORDER BY addr, doc_id
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, lang, n_chars FROM c WHERE cum <= budget
""",
    doc="Token-budget mixture sampling: per-stratum content-addressed "
    "prefix under a running token-sum window — the selected set is "
    "retry/cluster-stable and grows monotonically with the budget "
    "(operators/curation.token_budget_sample)",
)
def q_token_budget_sample(spark, sf_dir):
    from go_vectorsearch_spark.operators.curation import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    kept = token_budget_sample(
        docs, "lang", {"en": 4000, "zh": 1500}, default_budget=2500
    )
    return kept.select("doc_id", "lang", "n_chars")


@register(
    "ann_tradeoff_sweep",
    oracle=None,  # recall-vs-brute-force operational map: rows-only
    # check (k-means/LSH/PQ dependent orderings); the per-family
    # EXACTNESS claims are the in-window hash-checked anchors
    # (ivf_search_exact, ann_pca_exact, ann_ivfpq_exact, ann_lsh_search)
    doc="ANN tuning map: recall@10 vs brute force across all four "
    "families' quality dials on the SAME corpus and query — IVF nprobe "
    "1/2/4/all (prefix-union single job), LSH probe radius 0/1/2 "
    "(bucket-ring tiers, single job), PQ rerank adc/25/50, PCA k "
    "8/16/32/d. The PCA axis is prefix-nested from the ONE k=d fit: "
    "components are (eigenvalue desc)-sorted, so the first k rows of "
    "the full rotation ARE the k-component model and every k scores "
    "off a slice of the same stored projection — no extra fits. The "
    "operational complement of the exactness anchors; the measured "
    "wall-clock companion table lives in BASELINE.md (r10)",
)
def q_ann_tradeoff_sweep(spark, sf_dir):
    import numpy as np

    from go_vectorsearch_spark.operators.search import score_cosine

    bf = _bf_ids(spark, sf_dir, TOPK_K)
    qvec = _qvec(spark, sf_dir)

    def rec(ids) -> float:
        return float(round(len(bf & set(ids)) / len(bf), 4))

    # ---- the four family legs, each a deterministic function of its
    # own prebuilt store. Every leg builds its frame lazily and runs
    # ONE collect; the collects are independent, so they submit from a
    # thread pool (guide §2.6 — later legs back-fill the earlier legs'
    # straggler tails) and their rows land by leg, keeping the output
    # order and values identical to the sequential run.

    def _ivf_leg():
        # the existing one-job prefix-union sweep
        return [
            ("ivf_nprobe", str(r["nprobe"]), float(r["recall_at_10"]))
            for r in q_ivf_recall_sweep(spark, sf_dir).collect()
        ]

    # LSH probe radius 0/1/2 — one job, rows tiered by bucket ring
    # (ring 2 at 6 bits = 15 buckets: a tiny isin, lint-safe)
    bucketed = _lsh_bucketed_cached(spark, sf_dir)
    qb = LSH.bucket_of(list(qvec), _LSH_PLANES_SMALL)
    n_bits = len(_LSH_PLANES_SMALL)
    ring1 = [b for b in LSH._hamming_neighbors(qb, n_bits, 1) if b != qb]
    ring2 = [
        b
        for b in LSH._hamming_neighbors(qb, n_bits, 2)
        if b != qb and b not in set(ring1)
    ]

    def _lsh_leg():
        # unlike q_ann_lsh_recall (whose widest tier IS the brute-force
        # ground truth), radius 2 is this sweep's widest consumer — rows
        # beyond ring 2 were only ever tiered to be discarded, so filter
        # them BEFORE the top-k instead of sorting the whole
        # non-candidate corpus into a never-read tier (the r10 verdict's
        # weak spot)
        tiered = (
            score_cosine(bucketed, qvec, "embedding")
            .withColumn(
                "_tier",
                F.when(F.col("_bucket") == qb, F.lit(0))
                .when(F.col("_bucket").isin(ring1), F.lit(1))
                .when(F.col("_bucket").isin(ring2), F.lit(2)),
            )
            .filter(F.col("_tier").isNotNull())
        )
        rows = _per_tier_topk(tiered, "_tier", TOPK_K).collect()
        out = []
        for radius in (0, 1, 2):
            cand = [
                (r["score"], r["vec_id"]) for r in rows if r["_tier"] <= radius
            ]
            cand.sort(key=lambda t: (-t[0], t[1]))
            out.append(
                ("lsh_radius", str(radius), rec(v for _, v in cand[:TOPK_K]))
            )
        return out

    # PQ rerank depth — one candidate pass for all three depths (r13):
    # the ADC top-50 candidates come back with both engine-computed
    # ranking keys (ADC order + the exact-cosine round-6 rerank key),
    # and each depth's top-k replays driver-side over its prefix of the
    # SAME candidate list — identical ids to three pq_search calls,
    # minus two full re-scans of the coded store (guide §1.2: don't
    # compute things you throw away)
    from go_vectorsearch_spark.plans.pq import pq_candidate_frame

    books, coded = _pq_cached(spark, sf_dir)
    depths = (None, 25, 50)
    cand_k = max(TOPK_K, *(d for d in depths if d is not None))

    def _pq_leg():
        cands = pq_candidate_frame(coded, books, qvec, cand_k=cand_k).collect()
        out = []
        for rr in depths:
            if rr is None:
                ids = [r["vec_id"] for r in cands[:TOPK_K]]
            else:
                sub = sorted(
                    cands[:rr], key=lambda r: (-r["_exact_r6"], r["vec_id"])
                )[:TOPK_K]
                ids = [r["vec_id"] for r in sub]
            out.append(
                ("pq_rerank", "adc" if rr is None else str(rr), rec(ids))
            )
        return out

    # PCA k: reduced-space top-k per k, all ks in ONE unioned job over
    # slices of the same stored full-rotation projection
    model, proj = _pca_exact_cached(spark, sf_dir)
    ks = sorted({8, 16, 32, model.k})
    q = np.asarray(list(qvec), dtype=np.float64)

    def _pca_leg():
        legs = []
        for kk in ks:
            qk = [float(x) for x in (model.components[:kk] @ q)]
            legs.append(
                score_cosine(
                    proj.select("vec_id", F.slice("pca", 1, kk).alias("_pk")),
                    qk,
                    "_pk",
                ).select(F.lit(kk).alias("_k"), "vec_id", "score")
            )
        from functools import reduce as _reduce

        u = _reduce(lambda a, b: a.unionByName(b), legs)
        krows = _per_tier_topk(u, "_k", TOPK_K).select("_k", "vec_id").collect()
        return [
            (
                "pca_k",
                str(kk),
                rec(r["vec_id"] for r in krows if r["_k"] == kk),
            )
            for kk in ks
        ]

    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # inheritable_thread_target propagates the caller's JVM-thread-local
    # properties (job group/description) into the pool threads — the
    # documented way to run driver threads (guide §2.6), and it keeps
    # the legs' jobs attributed to this entry for the UI and the
    # job-count instrumentation. The session-parameterized form also
    # inherits session tags (the bare form warns and skips them).
    wrap = inheritable_thread_target(spark)
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(wrap(f))
            for f in (_ivf_leg, _lsh_leg, _pq_leg, _pca_leg)
        ]
        out = [row for fut in futs for row in fut.result()]
    return spark.createDataFrame(
        out, "family string, param string, recall_at_10 double"
    )


# The driver's CORRECTNESS gate checks the first 50 registry entries in
# order. Keep every oracle-bearing entry inside that window by listing
# the rows-only diagnostics (recall sweeps, lossy-ANN orderings, build
# stats) last — they carry pytest coverage instead of a hash oracle, so
# the weaker rows-only check is the right one for them regardless of
# position.
REGISTRY = {
    **{n: s for n, s in REGISTRY.items() if s.oracle is not None},
    **{n: s for n, s in REGISTRY.items() if s.oracle is None},
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle.strip()
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
