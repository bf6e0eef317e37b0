"""profile_columns: one-scan long-format table profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.profiling import profile_columns


def test_profile_shape_and_values(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", 2.0),
            (2, None, 4.0),
            (3, "beta", None),
            (3, "alpha", 8.0),
        ],
        "id long, name string, x double",
    )
    prof = {r["column"]: r for r in profile_columns(df, exact_distinct=True).collect()}
    assert set(prof) == {"id", "name", "x"}

    assert prof["id"]["dtype"] == "bigint"
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["id"]["min_value"] == "1"
    assert prof["id"]["max_value"] == "3"
    assert prof["id"]["mean"] == 2.25
    assert prof["id"]["avg_len"] is None

    assert prof["name"]["n_nulls"] == 1
    assert prof["name"]["n_distinct"] == 2
    assert prof["name"]["min_value"] == "alpha"
    assert prof["name"]["max_value"] == "beta"
    assert prof["name"]["mean"] is None
    # avg over non-null lengths: (5 + 4 + 5) / 3
    assert abs(prof["name"]["avg_len"] - 14 / 3) < 1e-9

    assert prof["x"]["n_nulls"] == 1
    assert prof["x"]["mean"] == 14.0 / 3


def test_profile_subset_and_single_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.lit(None).cast("string").alias("s")
    )
    out = profile_columns(df, cols=["m", "s"])
    rows = {r["column"]: r for r in out.collect()}
    assert set(rows) == {"m", "s"}
    assert rows["m"]["n_distinct"] == 7  # HLL exact at tiny cardinality
    assert rows["s"]["n_nulls"] == 100
    assert rows["s"]["min_value"] is None
    # approx (default) mode: no expand/multiple shuffles — a single
    # aggregate pair (partial + final) in the plan, scan appears once
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2 or "SortAggregate" in plan


def test_profile_quantiles_sketch(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"),
                                  F.lit("s").alias("s"))
    rows = {r["column"]: r for r in
            profile_columns(df, quantiles=(0.5, 0.99)).collect()}
    q = rows["x"]["quantiles"]
    assert len(q) == 2
    assert abs(q[0] - 500) <= 10  # approx median of 0..999
    assert q[1] >= 950
    assert rows["s"]["quantiles"] is None  # non-numeric -> NULL


def test_table_cache_is_session_isolated(spark):
    """_t plan cache lives on the session object: a sibling session must
    not see (or serve) another session's cached frames."""
    from go_vectorsearch_spark.queries import _t

    sf = "/root/testdata/sf0.001"
    a = _t(spark, sf, "region")
    sib = spark.newSession()
    b = _t(sib, sf, "region")
    assert a is _t(spark, sf, "region")  # cache hit within a session
    assert b is _t(sib, sf, "region")
    assert a is not b  # no cross-session leak
    assert spark._gvs_table_cache is not sib._gvs_table_cache
