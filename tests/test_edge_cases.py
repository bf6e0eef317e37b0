"""Empty-input and boundary behavior across operator families.

The reference mostly cannot hit these (its ingest path creates rows
before any operator runs); a standalone engine meets them on day one —
an empty category, a fresh table, a top-k larger than the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_quality_score_on_empty_text_is_low_not_null(spark):
    """Empty/NULL text must score a LOW quality number, never NULL:
    0/0 → NULL in Spark, and a NULL score passes neither side of a
    junk filter — the emptiest documents (exactly what the sweep
    exists to catch) would silently dodge both the remove-set and the
    keep-set."""
    from go_vectorsearch_spark.functions.text import alpha_ratio, quality_score

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a solid real document with words")],
        "id long, text string",
    )
    rows = {
        r["id"]: (r["ar"], r["q"])
        for r in df.select(
            "id",
            alpha_ratio(F.col("text")).alias("ar"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1][0] == 0.0 and rows[1][1] is not None
    assert rows[2][0] == 0.0 and rows[2][1] is not None
    assert rows[3][1] > rows[1][1]  # real text outranks junk
    # a junk filter actually catches them now
    kept = df.filter(quality_score(F.col("text")) >= 0.3).count()
    removed = df.filter(quality_score(F.col("text")) < 0.3).count()
    assert kept + removed == 3  # nothing dodges the sweep via NULL


def test_build_index_empty_corpus_raises(spark):
    from go_vectorsearch_spark.plans.ivf import build_index

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        build_index(empty, max_leaf=100, sample_size=10)


def test_brute_force_topk_k_exceeds_corpus(spark):
    from go_vectorsearch_spark.operators.search import brute_force_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    rows = brute_force_topk(df, [1.0, 0.0], k=10).collect()
    assert [r["vec_id"] for r in rows] == [1, 2]  # all rows, ranked


def test_profile_empty_table(spark):
    from go_vectorsearch_spark.operators.profiling import profile_columns

    prof = {r["column"]: r for r in profile_columns(_empty_docs(spark)).collect()}
    assert prof["doc_id"]["n_rows"] == 0
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["doc_id"]["n_distinct"] == 0
    assert prof["doc_id"]["min_value"] is None
    assert prof["text"]["avg_len"] is None


def test_dedup_families_empty_corpus(spark):
    from go_vectorsearch_spark.operators.dedup import (
        exact_dedup_stats,
        jaccard_pairs,
        simhash_pairs,
    )

    empty = _empty_docs(spark)
    stats = exact_dedup_stats(empty).collect()
    assert [tuple(r) for r in stats] == [(0, 0, 0)]
    assert jaccard_pairs(empty, threshold=0.2).count() == 0
    assert simhash_pairs(empty).count() == 0


def test_weighted_mix_empty_and_all_zero(spark):
    from go_vectorsearch_spark.operators.curation import weighted_mix

    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert weighted_mix(empty, "lang", {"en": 2.0}).count() == 0
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    assert weighted_mix(df, "lang", {}, default_weight=0.0).count() == 0


def test_paginate_offset_beyond_result(spark):
    from go_vectorsearch_spark.operators.search import topk_paginated

    df = spark.createDataFrame(
        [(i, 1.0 - i / 10) for i in range(3)], "document_id long, score double"
    )
    assert topk_paginated(df, count=5, offset=10).count() == 0
