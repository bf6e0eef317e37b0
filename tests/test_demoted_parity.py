"""DuckDB parity for queries demoted OUT of the 50-entry driver window.

The driver's CORRECTNESS gate checks only the first 50 registry entries,
so these relational/window extensions ceded their slots to the curation
family — their oracle SQL moved here and the parity bar stays identical
(same compare as tests/parity.py: row count, column names, value
multiset)."""

from __future__ import annotations

import pytest

from go_vectorsearch_spark import queries as Q
from tests.parity import _norm_rows, duckdb_conn

DEMOTED = [
    (Q.q_pivot_status_priority, Q.PIVOT_STATUS_ORACLE),
    (Q.q_events_sliding_quarter, Q.SLIDING_QUARTER_ORACLE),
    (Q.q_rollup_pricing, Q.ROLLUP_PRICING_ORACLE),
    (Q.q_lookup_in_list, Q.LOOKUP_IN_LIST_ORACLE),
    (Q.q_pack_sequences, Q.PACK_SEQUENCES_ORACLE),
    (Q.q_events_json_extract, Q.EVENTS_JSON_EXTRACT_ORACLE),
    (Q.q_range_join_shipments, Q.RANGE_JOIN_SHIPMENTS_ORACLE),
    (Q.q_events_rollup_time, Q.EVENTS_ROLLUP_TIME_ORACLE),
    (Q.q_profile_documents, Q.PROFILE_DOCUMENTS_ORACLE),
    (Q.q_weighted_mix, Q.WEIGHTED_MIX_ORACLE),
    (Q.q_cube_pricing, Q.CUBE_PRICING_ORACLE),
    (Q.q_vocab_top_terms, Q.VOCAB_TOP_TERMS_ORACLE),
    (Q.q_shard_manifest, Q.SHARD_MANIFEST_ORACLE),
    (Q.q_ivf_batch_probe_all, Q.IVF_BATCH_PROBE_ORACLE),
    (Q.q_train_val_test_split, Q.TRAIN_VAL_TEST_ORACLE),
    (Q.q_validate_embeddings, Q.VALIDATE_EMBEDDINGS_ORACLE),
    (Q.q_knn_graph_exact, Q.KNN_GRAPH_ORACLE),
    # r5 demotions — ceded their window slots to the round-4 fulltext /
    # filtered-search / quality-model oracle entries
    (Q.q_agg_pricing_summary, Q.AGG_PRICING_ORACLE),
    (Q.q_hash_sample_customers, Q.HASH_SAMPLE_ORACLE),
    (Q.q_window_running_revenue, Q.WINDOW_RUNNING_REVENUE_ORACLE),
    (Q.q_events_tumbling_hour, Q.EVENTS_TUMBLING_HOUR_ORACLE),
    (Q.q_agg_count_distinct, Q.AGG_COUNT_DISTINCT_ORACLE),
    (Q.q_multi_star_revenue, Q.MULTI_STAR_REVENUE_ORACLE),
    # r6 demotions — ceded their window slots to the r5 pipeline
    # operators (cdc_dup_stats, bpe_encode_docs, ngram_perplexity,
    # token_budget_sample)
    (Q.q_events_sessionize, Q.EVENTS_SESSIONIZE_ORACLE),
    (Q.q_sample_stratified, Q.SAMPLE_STRATIFIED_ORACLE),
    (Q.q_text_fingerprint, Q.TEXT_FINGERPRINT_ORACLE),
    (Q.q_dedup_simhash_docs, Q.DEDUP_SIMHASH_DOCS_ORACLE),
    # r7 demotions — ceded their window slots to dedup_exact_substr and
    # decontaminate_spans
    (Q.q_text_repetition, Q.TEXT_REPETITION_ORACLE),
    (Q.q_pii_redact, Q.PII_REDACT_ORACLE),
    # r8 demotion — ceded its window slot to ann_pca_exact (the PCA
    # family's zero-loss anchor); span-level decontamination stays
    # in-window
    (Q.q_decontaminate_docs, Q.DECONTAMINATE_DOCS_ORACLE),
    # (the r8-added IVF-PQ exactness limit rotated INTO the window r9
    # as ann_ivfpq_exact, ceding this list its cosine_topk_quantized
    # slot below)
    # r8 demotion — ceded its window slot to substr_cut_docs (the
    # keeper-protected cut's full oracle); multimodal stays in-window
    # via multimodal_features
    (Q.q_multimodal_frame_sample, Q.MULTIMODAL_FRAME_SAMPLE_ORACLE),
    # (the r8-added decontaminate_cut_docs — the benchmark-cut write
    # path's no-keeper twin — rotated INTO the window r10, ceding this
    # list its pagination_orders slot below)
    # r9 demotion — ceded its window slot to ann_ivfpq_exact (the PQ
    # family's exactness anchor); quantized-search semantics stay
    # driver-proved via the in-window cosine_topk + quantize_roundtrip
    (Q.q_cosine_topk_quantized, Q.COSINE_TOPK_QUANTIZED_ORACLE),
    # r10 demotion — ceded its window slot to decontaminate_cut_docs
    # (the span family's last driver-unproved member); T3 pagination has
    # been green since round 1 and keeps the identical bar here
    (Q.q_pagination_orders, Q.PAGINATION_ORDERS_ORACLE),
    # (the r10-added line_dedup_docs — corpus-level line/boilerplate
    # dedup — rotated INTO the window r11, ceding this list its
    # join_semi_segment slot below)
    # r11 demotion — ceded its window slot to line_dedup_docs; J3
    # semi-join keeps the identical bar here
    (Q.q_join_semi_segment, Q.JOIN_SEMI_SEGMENT_ORACLE),
    # r11 demotion — ceded its window slot to pipeline_curate_docs (the
    # end-to-end curation composition's oracle); A1 count+join keeps
    # the identical bar here
    (Q.q_agg_count_join, Q.AGG_COUNT_JOIN_ORACLE),
    # r12 demotion — ceded its window slot to boilerplate_cut_docs (the
    # line-dedup family's fixpoint oracle); S3 point lookup has been
    # green since round 1 and keeps the identical bar here
    (Q.q_point_lookup, Q.POINT_LOOKUP_ORACLE),
    # r13 demotion — ceded its window slot to dedup_semantic (the last
    # LLM-pipeline family member without a driver-proved row); T2/D1
    # deduped top-k has been green since round 1, keeps the identical
    # bar here, and T2 stays driver-proved via the in-window cosine_topk
    (Q.q_topk_dedup_customer, Q.TOPK_DEDUP_CUSTOMER_ORACLE),
]


@pytest.mark.parametrize("fn,oracle", DEMOTED, ids=lambda p: getattr(p, "__name__", ""))
def test_demoted_query_parity(spark, sf_correct, fn, oracle):
    sdf = fn(spark, sf_correct)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_correct)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _norm_rows(s_cols, s_rows) == _norm_rows(d_cols, d_rows)


def test_validate_embeddings_parity_on_planted_dirty_rows(spark, tmp_path):
    """The degenerate inputs the validator exists to catch — empty
    array, NULL vector, NULL element, NaN element, zero vector — must
    count identically on both engines (the sf fixtures contain none of
    them, so the standard parity run can't see a divergence here)."""
    import duckdb

    rows = [
        (0, [1.0, 2.0]),          # clean
        (1, [0.0, 0.0]),          # zero vector
        (2, []),                  # empty -> zero (no signal)
        (3, None),                # NULL vector
        (4, [0.0, None]),         # NULL element, zero otherwise
        (5, [float("nan"), 1.0]), # NaN element
        (6, [1.0, 2.0, 3.0]),     # second dimension
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "dirty_emb")
    df.repartition(1).write.parquet(path)

    # q_validate_embeddings loads '<sf_dir>/embeddings.parquet'; lay the
    # file out that way instead of monkeypatching the loader
    import shutil

    root = tmp_path / "sfdirty"
    root.mkdir()
    shutil.move(path, str(root / "embeddings.parquet"))
    sdf = Q.q_validate_embeddings(spark, str(root))
    s = sdf.head().asDict()

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{root}/embeddings.parquet/*.parquet')"
        )
        res = con.execute(Q.VALIDATE_EMBEDDINGS_ORACLE)
        d = dict(zip([c[0] for c in res.description], res.fetchone()))
    finally:
        con.close()
    assert s == d, f"spark {s} != duckdb {d}"
    # and the counts themselves are the planted truth
    assert s["n_rows"] == 7 and s["null_vectors"] == 1
    assert s["null_element_vectors"] == 1 and s["nan_vectors"] == 1
    assert s["zero_vectors"] == 3  # zero + empty + (0.0, NULL)


def test_pq_rerank_stage_duckdb_parity(spark, sf_correct):
    """The PQ two-stage search's exact RE-RANK is deterministic and
    DuckDB-expressible: given the ADC candidate id set, re-ranking by
    exact cosine (round-6 desc, id asc) must agree row-for-row with
    DuckDB doing the same over the same candidates. The lossy ADC
    ordering itself stays recall-bounded in tests/test_pq.py — this
    pins the half of the pipeline that has an exact oracle."""
    from go_vectorsearch_spark.plans.pq import encode_pq, pq_search, train_pq

    emb = Q._t(spark, sf_correct, "embeddings")
    qvec = Q._qvec(spark, sf_correct)
    cb = train_pq(emb, m=8, k_sub=16)
    coded = encode_pq(emb, cb)
    R, K = 50, 10

    # stage 1 (ADC) alone: the candidate set the re-rank will see
    cand_ids = [
        r["vec_id"] for r in pq_search(coded, cb, qvec, k=R, rerank=None).collect()
    ]
    assert len(cand_ids) == R
    # full two-stage search
    reranked = pq_search(coded, cb, qvec, k=K, rerank=R)
    s_rows = [(r["vec_id"], round(r["score"], 5)) for r in reranked.collect()]

    con = duckdb_conn(sf_correct)
    try:
        ids = ",".join(str(i) for i in cand_ids)
        res = con.execute(f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       list_sum(list_transform(generate_series(1, len(e.embedding)),
                               i -> e.embedding[i]::DOUBLE * q.qv[i]))
       / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
          * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS score
FROM embeddings e, q
WHERE e.vec_id IN ({ids})
ORDER BY round(score, 6) DESC, e.vec_id ASC
LIMIT {K}
""")
        d_rows = [(r[0], round(r[1], 5)) for r in res.fetchall()]
    finally:
        con.close()
    assert s_rows == d_rows
