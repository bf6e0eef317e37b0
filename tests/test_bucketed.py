"""Bucketed co-located joins: the no-shuffle property and value parity.

The claim under test (sources/bucketed.py): writing both join sides
``bucketBy(N, key)`` converts every later equi-join on the key into a
SortMergeJoin over bucketed scans with NO Exchange — the write-once
shuffle amortized over all downstream joins. Asserted on the physical
plan, with rows checked against the plain shuffled join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.sources.bucketed import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_correct, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet").withColumn(
        # FK: the testdata embeddings carry vec_id == document row id
        "document_id", F.col("vec_id")
    )
    write_bucketed(docs.withColumnRenamed("doc_id", "document_id"),
                   "t_docs_b", "document_id", num_buckets=8,
                   path=str(base / "docs"))
    write_bucketed(emb, "t_emb_b", "document_id", num_buckets=8,
                   path=str(base / "emb"))
    yield "t_docs_b", "t_emb_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_emb_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    docs_t, emb_t = bucketed_pair
    # disable auto-broadcast so the small fixture exercises the
    # SortMergeJoin path a 100 TB table pair would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, emb_t, docs_t, "document_id").select(
            "document_id", "vec_id", "label"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, (
            "co-bucketed equi-join must not shuffle:\n" + plan[:1500]
        )
        # the scans themselves must be bucket-aware (catalog metadata
        # consumed), not plain parquet reads that happen to line up
        assert "Bucketed: true" in plan, plan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_rows_equal_plain_join(spark, sf_correct, bucketed_pair):
    docs_t, emb_t = bucketed_pair
    got = sorted(
        (r["document_id"], r["vec_id"])
        for r in bucketed_join(spark, emb_t, docs_t, "document_id")
        .select("document_id", "vec_id")
        .collect()
    )
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    want = sorted(
        (r["doc_id"], r["vec_id"])
        for r in emb.join(docs, emb.vec_id == docs.doc_id)
        .select("doc_id", "vec_id")
        .collect()
    )
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    _docs_t, emb_t = bucketed_pair
    agg = read_bucketed(spark, emb_t).groupBy("document_id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, (
        "groupBy on the bucket key must pre-aggregate in place:\n" + plan[:1500]
    )
