"""Unit tests for operators/curation.py (the registry queries'
DuckDB parity runs in test_parity.py; these pin operator behavior and
the scale-critical plan shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators import curation as CUR
from go_vectorsearch_spark.operators.dedup import shingled_docs


def test_redact_pii_counts_and_replaces(spark):
    rows = [
        (1, "mail me at bob.smith+x@corp.example.org thanks"),
        (2, "ssn 123-45-6789 and phone 555-123-4567"),
        (3, "two mails: a@b.co c@d.io"),
        (4, "clean text with no pii at all"),
        (5, "almost a phone 55-123-4567 and almost ssn 123-456-789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in CUR.redact_pii(df).collect()}

    assert (out[1]["n_email"], out[1]["n_ssn"], out[1]["n_phone"]) == (1, 0, 0)
    assert "[EMAIL]" in out[1]["clean_text"]
    assert "bob.smith" not in out[1]["clean_text"]

    assert (out[2]["n_email"], out[2]["n_ssn"], out[2]["n_phone"]) == (0, 1, 1)
    assert out[2]["clean_text"] == "ssn [SSN] and phone [PHONE]"

    assert out[3]["n_email"] == 2
    assert out[3]["clean_text"] == "two mails: [EMAIL] [EMAIL]"

    assert out[4]["clean_text"] == rows[3][1]  # untouched
    # near-miss formats must NOT match (word boundaries + exact groups)
    assert (out[5]["n_ssn"], out[5]["n_phone"]) == (0, 0)


def test_contamination_flags_exact_overlap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (100, base),  # benchmark doc
            (1, base + " with a tiny tail"),  # heavy overlap -> flagged
            (2, "totally different words everywhere nothing shared here"),
            (3, "the quick brown fox only"),  # 2 shared shingles < 5
        ],
        "doc_id long, text string",
    )
    sh = shingled_docs(docs)
    bench = sh.filter(F.col("_id") == 100)
    train = sh.filter(F.col("_id") != 100)
    flags = CUR.contamination_flags(train, bench, min_overlap=5)
    got = {r["_id"]: (r["n_bench_hits"], r["max_overlap"]) for r in flags.collect()}
    assert set(got) == {1}
    assert got[1][0] == 1 and got[1][1] >= 5


def test_contamination_broadcasts_benchmark_side(spark):
    docs = spark.createDataFrame(
        [(i, f"doc number {i} words {i} more {i}") for i in range(20)],
        "doc_id long, text string",
    )
    sh = shingled_docs(docs)
    flags = CUR.contamination_flags(
        sh.filter(F.col("_id") > 0), sh.filter(F.col("_id") == 0), min_overlap=1
    )
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus never shuffles on shingle


def test_stratified_sample_deterministic_and_quota_shaped(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    samp = CUR.stratified_sample(
        docs, "lang", {"en": 60, "zh": 30}, default_pct=15, id_col="doc_id"
    )
    a = sorted(r["doc_id"] for r in samp.collect())
    b = sorted(r["doc_id"] for r in samp.collect())
    assert a == b and len(a) > 0  # content-addressed: identical re-run

    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en keeps roughly 60%, others roughly 15% (loose bounds: small n)
    en_rate = kept.get("en", 0) / totals["en"]
    fr_rate = kept.get("fr", 0) / totals["fr"]
    assert 0.4 < en_rate < 0.8
    assert fr_rate < 0.4


def test_strip_boilerplate_lines_semantics(spark):
    """CCNet-style line dedup on a planted corpus: a footer shared by
    >= min_df docs is cut from EVERY document (no keeper), unique and
    sub-threshold lines survive in order, normalized-empty lines are
    structure (never counted, never cut), untouched documents round-trip
    byte-for-byte (incl. trailing newline), and an all-boilerplate doc
    comes back as ''."""
    footer = "Standard Footer Line"
    rows = [
        (1, f"alpha one\n{footer}\nbeta"),
        (2, f"{footer}\ngamma two"),
        (3, f"delta\n\n{footer}"),          # empty line kept
        (4, f"  {footer.upper()}  "),        # normalization: all-boilerplate
        (5, "clean doc\nwith lines\n"),      # untouched, trailing \n
        (6, "pair line\nsolo six"),          # df=2 < min_df=3: kept
        (7, "pair line\nsolo seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hot = {r["_lh"] for r in CUR.boilerplate_lines(df, min_df=3).collect()}
    assert len(hot) == 1  # only the footer crosses df >= 3

    out = {
        r["doc_id"]: r["text"]
        for r in CUR.strip_boilerplate_lines(df, min_df=3).collect()
    }
    assert out[1] == "alpha one\nbeta"
    assert out[2] == "gamma two"
    assert out[3] == "delta\n"              # empty line survives
    assert out[4] == ""                     # every line was boilerplate
    assert out[5] == rows[4][1]             # byte-exact passthrough
    assert out[6] == rows[5][1] and out[7] == rows[6][1]
    # idempotence: a stripped corpus has no hot lines left
    clean = spark.createDataFrame(list(out.items()), "doc_id long, text string")
    assert CUR.boilerplate_lines(clean, min_df=3).count() == 0


def test_strip_boilerplate_hot_set_joins_as_frame(spark):
    """The hot set must reach the plan as a JOIN, not a collected
    isin literal (a corpus can have millions of boilerplate lines)."""
    df = spark.createDataFrame(
        [(i, f"u{i}\ncommon line") for i in range(12)],
        "doc_id long, text string",
    )
    out = CUR.strip_boilerplate_lines(df, min_df=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "INSET" not in plan and " IN (" not in plan
    # exactly the hot-flag join: doc survival is the conditional
    # aggregate itself since r13 (an all-hot doc rebuilds to '' inside
    # the groupBy), so a second doc-list join reappearing is a
    # regression, not robustness
    assert plan.count("Join") == 1
    assert all(r["text"] == f"u{r['doc_id']}" for r in out.collect())


def test_repetition_stats_flags_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "buy now click here\n" * 10),          # one dup'd line, one hot bigram
            (2, "alpha beta gamma delta\nepsilon zeta eta theta"),
            (3, "read more...\nread more...\nunique tail line"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in CUR.repetition_stats(docs, ngram=2, max_tokens=200).collect()
    }
    assert rows[1]["dup_line_frac"] > 0.8          # 10 identical lines + trailing ''
    assert rows[1]["top_ngram_frac"] > 0.2         # "here buy" / "buy now" dominate
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["top_ngram_frac"] < 0.2
    assert rows[3]["ellipsis_line_frac"] == pytest.approx(2 / 3)
    # expression-only: no exchange in the plan
    plan = (
        CUR.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_invariants(spark):
    import random

    rng = random.Random(7)
    docs = spark.createDataFrame(
        [(i, rng.randint(1, 300)) for i in range(500)], "doc_id long, n_tokens long"
    )
    packed = CUR.pack_sequences(docs, ctx_len=256, n_shards=8).collect()
    assert len(packed) == 500
    by_shard = {}
    for r in packed:
        assert 0 <= r["pack_offset"] < 256          # starts inside its pack
        assert r["pack_id"] >> 32 == r["shard"]     # global id embeds shard
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        total = sum(r["n_tokens"] for r in rows)
        n_packs = len({r["pack_id"] for r in rows})
        # concat-and-chunk: at most one start-pack per ctx window; a doc
        # longer than ctx spans windows nobody else starts in, so the
        # lower bound divides by (ctx + max doc len)
        assert n_packs <= total // 256 + 1
        assert n_packs >= total // (256 + 300)
    # deterministic: content-addressed, independent of partition layout
    again = CUR.pack_sequences(docs.repartition(13), ctx_len=256, n_shards=8).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))


def test_weighted_mix_oversamples_deterministically(spark):
    from go_vectorsearch_spark.operators.curation import weighted_mix

    df = spark.createDataFrame(
        [(i, "hq" if i % 3 == 0 else "lq") for i in range(300)],
        "doc_id long, lang string",
    )
    mixed = weighted_mix(df, "lang", {"hq": 2.5, "lq": 0.5}, id_col="doc_id")
    rows = mixed.collect()
    again = weighted_mix(df, "lang", {"hq": 2.5, "lq": 0.5}, id_col="doc_id").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))  # deterministic

    by = {}
    for r in rows:
        by.setdefault(r["lang"], []).append(r)
    # every hq row appears at least twice (floor(2.5)); ~half get a third copy
    hq_counts = {}
    for r in by["hq"]:
        hq_counts[r["doc_id"]] = max(hq_counts.get(r["doc_id"], 0), r["_copy"])
    assert all(c in (2, 3) for c in hq_counts.values())
    assert len(hq_counts) == 100
    third = sum(1 for c in hq_counts.values() if c == 3)
    assert 25 <= third <= 75  # ~50% fraction, hash-uniform
    # lq: no duplicates, roughly half survive
    lq_ids = [r["doc_id"] for r in by["lq"]]
    assert len(set(lq_ids)) == len(lq_ids)
    assert 60 <= len(lq_ids) <= 140
    # copy numbering starts at 1
    assert min(r["_copy"] for r in rows) == 1


def test_weighted_mix_zero_weight_drops_stratum(spark):
    from go_vectorsearch_spark.operators.curation import weighted_mix

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, lang string"
    )
    out = weighted_mix(df, "lang", {"a": 0.0}, default_weight=1.0).collect()
    assert [(r["doc_id"], r["_copy"]) for r in out] == [(2, 1)]


def test_train_val_test_split_deterministic_and_complete(spark, sf_smoke):
    from go_vectorsearch_spark.operators.curation import train_val_test_split

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in train_val_test_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in train_val_test_split(docs).collect()}
    assert a == b  # rerun-stable
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()  # every row assigned exactly once
    # growing the input never reassigns existing rows (content-addressed)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    h = {r["doc_id"]: r["split"] for r in train_val_test_split(half).collect()}
    assert all(a[k] == v for k, v in h.items())


def test_train_val_test_split_rejects_bad_fractions(spark, sf_smoke):
    import pytest as _pytest

    from go_vectorsearch_spark.operators.curation import train_val_test_split

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    with _pytest.raises(ValueError, match="sum to"):
        train_val_test_split(docs, {"train": 0.5, "val": 0.1})


class TestClusterBalancedSample:
    def _docs(self, spark):
        # power-law clusters: 40 rows in cluster 0, 15 in 1, 5 in 2
        rows = [(i, 0 if i < 40 else (1 if i < 55 else 2), f"doc {i}")
                for i in range(60)]
        return spark.createDataFrame(rows, "doc_id long, cluster long, text string")

    def test_cap_respected_and_duckdb_parity(self, spark):
        from go_vectorsearch_spark.operators.curation import (
            cluster_balanced_sample,
        )

        df = self._docs(spark)
        out = cluster_balanced_sample(df, "cluster", per_cluster=10)
        by_c: dict[int, set] = {}
        for r in out.collect():
            by_c.setdefault(r["cluster"], set()).add(r["doc_id"])
        assert len(by_c[0]) == 10       # dominant topic capped
        assert len(by_c[1]) == 10
        assert len(by_c[2]) == 5        # small cluster kept whole

        import duckdb

        con = duckdb.connect()
        try:
            con.register("docs", df.toPandas())
            want = {r[0] for r in con.execute("""
WITH t AS (
  SELECT doc_id, cluster,
         row_number() OVER (
           PARTITION BY cluster
           ORDER BY CAST(('0x' || substring(md5('diverse:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    doc_id) AS rn
  FROM docs
)
SELECT doc_id FROM t WHERE rn <= 10
            """).fetchall()}
        finally:
            con.close()
        got = {r["doc_id"] for r in out.collect()}
        assert got == want

    def test_monotone_and_partition_invariant(self, spark):
        """Raising per_cluster only ADDS rows (hash-order prefix), and
        the selected set is identical under any partitioning."""
        from go_vectorsearch_spark.operators.curation import (
            cluster_balanced_sample,
        )

        df = self._docs(spark)
        small = {r["doc_id"] for r in
                 cluster_balanced_sample(df, "cluster", 5).collect()}
        big = {r["doc_id"] for r in
               cluster_balanced_sample(df, "cluster", 20).collect()}
        assert small <= big
        again = {r["doc_id"] for r in
                 cluster_balanced_sample(df.repartition(7), "cluster", 5).collect()}
        assert again == small

    def test_composes_with_ivf_assignment(self, spark, sf_smoke):
        """The deployment shape: clusters = the engine's stored IVF
        centroid_id column; the balanced sample caps every inverted
        list at the same size."""
        from go_vectorsearch_spark.operators.assign import assign_nearest_mat
        from go_vectorsearch_spark.operators.curation import (
            cluster_balanced_sample,
        )
        import numpy as np

        emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
        cents = [(i, np.array([1.0 if j == i else 0.1 for j in range(64)]))
                 for i in range(3)]
        assigned = assign_nearest_mat(
            emb, cents, vec_col="embedding", out_col="centroid_id"
        )
        out = cluster_balanced_sample(
            assigned, "centroid_id", per_cluster=7, id_col="vec_id"
        )
        sizes = {r["centroid_id"]: r["n"] for r in
                 out.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()}
        assert sizes and all(n <= 7 for n in sizes.values())


class TestTokenBudgetSample:
    def _docs(self, spark):
        rows = [
            (i, "code" if i % 3 == 0 else "web",
             " ".join(f"tok{j}" for j in range((i % 7) + 2)))
            for i in range(60)
        ]
        return spark.createDataFrame(rows, "doc_id long, domain string, text string")

    def test_budget_respected_and_duckdb_parity(self, spark):
        from go_vectorsearch_spark.operators.curation import token_budget_sample

        df = self._docs(spark)
        out = token_budget_sample(
            df, "domain", {"code": 40, "web": 25}, default_budget=0
        )
        rows = out.collect()
        by_dom: dict[str, int] = {}
        for r in rows:
            by_dom[r["domain"]] = by_dom.get(r["domain"], 0) + len(r["text"].split())
        assert by_dom.get("code", 0) <= 40
        assert by_dom.get("web", 0) <= 25
        assert rows, "sampler kept nothing"

        # DuckDB twin: same hash addressing, same prefix rule
        import duckdb

        con = duckdb.connect()
        try:
            con.register("docs", df.toPandas())
            want = {r[0] for r in con.execute("""
WITH t AS (
  SELECT doc_id, domain,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         CAST(('0x' || substring(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS addr,
         CASE domain WHEN 'code' THEN 40 WHEN 'web' THEN 25 ELSE 0 END AS budget
  FROM docs
), c AS (
  SELECT *, sum(n_tok) OVER (
    PARTITION BY domain ORDER BY addr, doc_id
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id FROM c WHERE cum <= budget
            """).fetchall()}
        finally:
            con.close()
        assert {r["doc_id"] for r in rows} == want

    def test_monotone_growth_with_budget(self, spark):
        """Raising a budget only ADDS documents (prefix property)."""
        from go_vectorsearch_spark.operators.curation import token_budget_sample

        df = self._docs(spark)
        small = {r["doc_id"] for r in token_budget_sample(
            df, "domain", {}, default_budget=30).collect()}
        big = {r["doc_id"] for r in token_budget_sample(
            df, "domain", {}, default_budget=90).collect()}
        assert small <= big
        # determinism across partitionings
        again = {r["doc_id"] for r in token_budget_sample(
            df.repartition(7), "domain", {}, default_budget=30).collect()}
        assert again == small

    def test_shard_count_invariant(self, spark):
        """The r12 two-level prefix sum is an EXECUTION shape, not a
        semantic: the selected set is bit-identical for any n_shards
        (1 = the old single-window degenerate case), because the range
        shards split each stratum's hash order into contiguous runs and
        token sums only reassociate."""
        from go_vectorsearch_spark.operators.curation import token_budget_sample

        df = self._docs(spark)
        sets = [
            {r["doc_id"] for r in token_budget_sample(
                df, "domain", {"code": 40}, default_budget=30,
                n_shards=n).collect()}
            for n in (1, 7, 256)
        ]
        assert sets[0] == sets[1] == sets[2] and sets[0]
        with pytest.raises(ValueError, match="n_shards"):
            token_budget_sample(df, "domain", {}, 30, n_shards=0)

    def test_null_stratum_sampled_under_default_budget(self, spark):
        """A NULL stratum is a real partition (SQL PARTITION BY groups
        NULLs; the pre-r12 single window did too) sampled at the
        default budget — the two-level reshard must not silently drop
        it through an inner join on a NULL key (r12 self-review: the
        sentinel key exists for exactly this)."""
        import duckdb

        from go_vectorsearch_spark.operators.curation import token_budget_sample

        rows = [(i, None if i % 3 == 0 else "web", "w " * (i % 7 + 1))
                for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
        out = token_budget_sample(df, "domain", {"web": 25}, default_budget=18)
        got = {(r["doc_id"], r["domain"]) for r in out.collect()}
        assert any(d is None for _, d in got), "null stratum was dropped"

        con = duckdb.connect()
        try:
            con.register("docs", df.toPandas())
            want = {r[0] for r in con.execute("""
WITH t AS (
  SELECT doc_id, domain,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         CAST(('0x' || substring(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS addr,
         CASE domain WHEN 'web' THEN 25 ELSE 18 END AS budget
  FROM docs
), c AS (
  SELECT *, sum(n_tok) OVER (
    PARTITION BY domain ORDER BY addr, doc_id
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id FROM c WHERE cum <= budget
            """).fetchall()}
        finally:
            con.close()
        assert {i for i, _ in got} == want

    def test_non_string_strata_budget_keys_match_natively(self, spark):
        """Budget keys match with NATIVE-equality semantics on a
        non-string strata column (r12 advice): an int key 5 must hit a
        DOUBLE stratum 5.0 exactly like the pre-sentinel
        ``col == lit(key)`` compare did — a bare str(key) render
        ('5' vs the column's '5.0') silently sampled every non-string
        stratum at default_budget."""
        from go_vectorsearch_spark.operators.curation import token_budget_sample

        rows = [(i, float(i % 2) + 4.0, "w " * 5) for i in range(40)]
        df = spark.createDataFrame(
            rows, "doc_id long, bucket double, text string"
        )
        out = token_budget_sample(
            df, "bucket", {5: 10}, default_budget=10_000
        )
        per = {
            r["bucket"]: r["n"]
            for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert per.get(4.0) == 20  # default budget keeps the whole stratum
        # the 10-token budget keyed 5 must BIND to stratum 5.0: a
        # 2-document prefix (5 tokens each), not all 20
        assert per.get(5.0) == 2


def test_boilerplate_cut_docs_converges_in_two_passes(spark, sf_correct):
    """The boilerplate_cut_docs oracle unrolls the fixpoint as exactly
    TWO SQL passes — valid only because the derived cascade corpus's
    pass-3 fit is empty. Pin that directly at the driver's correctness
    scale (the curate-oracle precedent: a fixture change fails HERE
    with a named reason, not as an opaque oracle hash-mismatch), and
    pin that the cascade really happens: pass 1 empties the footer-only
    docs into frozen '.' markers, and the staged 'common tail' family
    is cut only AFTER the period migration (pass 2), so a single-pass
    run still carries it."""
    from go_vectorsearch_spark.operators.curation import (
        boilerplate_lines,
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_multiline_text,
    )
    from go_vectorsearch_spark.queries import _BP_MIN_DF, _bp_corpus
    from go_vectorsearch_spark.sources.tables import load_table

    corpus = _bp_corpus(load_table(spark, sf_correct, "documents"))
    out = strip_boilerplate_fixpoint(
        corpus, min_df=_BP_MIN_DF, iterate=3,
        normalize=format_multiline_text,
    )
    # pass-3 fit empty over the still-active (non-marker) documents —
    # the 2-pass SQL unroll's exactness condition
    assert boilerplate_lines(
        out.filter(F.col("text") != "."), min_df=_BP_MIN_DF
    ).isEmpty(), "cascade corpus no longer converges in two passes"
    texts = [r["text"] for r in out.collect()]
    out.unpersist()
    n_markers = sum(t == "." for t in texts)
    assert n_markers == sum(
        1 for r in corpus.collect() if r["text"] == "zap footer"
    ) > 0, "footer-only docs must freeze as markers"
    # full buckets' tails are gone; the trailing partial bucket (< min_df
    # members) legitimately keeps its sub-threshold tail
    survivors = [t for t in texts if "common tail" in t]
    n_docs = len(texts)
    assert all(
        int(t.split("common tail ")[1].split(".")[0]) == (n_docs - 1) // 12
        for t in survivors
    ), "a full bucket's tail survived the pass-2 cut"
    # ...and a SINGLE pass leaves every tail in place (the migration is
    # what merges the family across min_df — the fixpoint is load-bearing)
    one_pass = strip_boilerplate_fixpoint(
        corpus, min_df=_BP_MIN_DF, iterate=1,
        normalize=format_multiline_text,
    )
    n_tails_p1 = one_pass.filter(F.col("text").contains("common tail")).count()
    one_pass.unpersist()
    assert n_tails_p1 > len(survivors), (
        "pass 1 already cut the staged family — the fixture no longer "
        "exercises the fixpoint"
    )


def test_curate_pipeline_substr_stage_converges_in_one_pass(spark, sf_smoke, sf_correct):
    """The pipeline_curate_docs oracle derives the exact-substring cut as
    ONE SQL pass while the Spark side runs the fixpoint (iterate=3) —
    valid only because the line-stripped fixture corpus converges after
    pass 1. Pin that at BOTH driver scales: if a fixture regenerate ever
    produced a corpus needing a second pass, this fails with a direct
    message instead of a confusing oracle hash-mismatch. Also pin that
    the pipeline's filter stages stay non-degenerate (each stage really
    executes: the cut changes documents, the quality bar drops some and
    keeps some)."""
    from go_vectorsearch_spark.operators import substr as SUB
    from go_vectorsearch_spark.queries import (
        _CURATE_QUALITY_MIN,
        _LINE_DEDUP_MIN_DF,
        _SUBSTR_L,
    )
    from go_vectorsearch_spark.sources.tables import load_table

    from go_vectorsearch_spark.queries import _lined_corpus

    for sf in (sf_smoke, sf_correct):
        docs = load_table(spark, sf, "documents")
        stripped = CUR.strip_boilerplate_lines(
            _lined_corpus(docs), min_df=_LINE_DEDUP_MIN_DF
        )
        p1 = SUB.exact_substr_cut(stripped, L=_SUBSTR_L, iterate=1)
        p2 = SUB.exact_substr_cut(p1, L=_SUBSTR_L, iterate=1)
        changed = (
            p2.select("doc_id", F.col("text").alias("_a"))
            .join(p1.select("doc_id", F.col("text").alias("_b")), "doc_id")
            .filter(F.col("_a") != F.col("_b"))
            .count()
        )
        assert changed == 0, (
            f"{sf}: substring cut no longer converges in one pass — "
            "pipeline_curate_docs' one-pass oracle is invalid here"
        )
        n_cut = (
            p1.join(
                stripped.select("doc_id", F.col("text").alias("_o")), "doc_id"
            )
            .filter(F.col("text") != F.col("_o"))
            .count()
        )
        assert n_cut > 0, f"{sf}: the cut stage became a no-op"


def test_curate_pipeline_quality_stage_not_degenerate(spark, sf_correct):
    """quality >= _CURATE_QUALITY_MIN must drop SOME and keep MOST docs
    at the driver's correctness scale — a bar everything clears (the 0.5
    default post-cut) or nothing clears would make the stage decorative."""
    from go_vectorsearch_spark.queries import REGISTRY

    out = {
        r["lang"]: r["n_docs"]
        for r in REGISTRY["pipeline_curate_docs"].fn(spark, sf_correct).collect()
    }
    assert sum(out.values()) > 50      # the mix kept a real corpus
    assert len(out) >= 3               # several language strata survive


def test_strip_boilerplate_fixpoint_period_migration_and_freeze(spark):
    """The line-level analog of the substring family's r10
    pre-normalization close, plus the empty-document freeze:
      pass 1 cuts the hot 'zap.' footer; the two documents it was LAST
        line of get their new last line period-appended INSIDE the loop,
        which pushes 'shared tail.' from df 2+2 over min_df=3 — a fit
        on un-normalized text would never see it;
      pass 2 cuts 'shared tail.' everywhere, fully emptying four
        documents — they freeze as the irremovable '.' marker instead
        of feeding a '.' boilerplate family back into the fit (the
        '.' -> '' -> '.' cycle);
      pass 3 finds nothing hot among the still-active documents."""
    from go_vectorsearch_spark.operators.curation import (
        boilerplate_lines,
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_rejoined_text,
    )

    docs = [
        (1, "shared tail\nzap."),
        (2, "shared tail\nzap."),
        (3, "unique three\nzap."),
        (4, "shared tail."),
        (5, "shared tail."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = strip_boilerplate_fixpoint(
        df, min_df=3, iterate=5, normalize=format_rejoined_text
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: ".", 2: ".", 3: "unique three.", 4: ".", 5: "."}
    # converged: nothing hot among non-marker documents
    assert boilerplate_lines(
        out.filter(F.col("text") != "."), min_df=3
    ).isEmpty()
    out.unpersist()

    # WITHOUT the storage convention the migration never happens: the
    # un-normalized 'shared tail' (df 2) and 'shared tail.' (df 2) stay
    # distinct sub-threshold families
    plain = strip_boilerplate_fixpoint(df, min_df=3, iterate=5)
    got = {r["doc_id"]: r["text"] for r in plain.collect()}
    assert got == {
        1: "shared tail",
        2: "shared tail",
        3: "unique three",
        4: "shared tail.",
        5: "shared tail.",
    }
    plain.unpersist()


def test_engine_boilerplate_report_and_cut(spark, tmp_path):
    """Engine write path for the line-dedup family (the substring /
    decontamination cut families' sibling): report finds the shared
    footer line flatten() placed in every list payload, the cut rewrites
    ONLY the carrying documents through the partition-scoped upsert,
    report-after-cut is empty, and the text index serves the cut
    corpus."""
    import json as _json

    from go_vectorsearch_spark.api import Engine
    from go_vectorsearch_spark.operators.fulltext import bm25_search_stored

    e = Engine(spark, str(tmp_path))
    footer = "subscribe to our newsletter"
    # empty-list/empty-dict payload items make flatten() emit an EMPTY
    # line before the footer ("body.\n\nfooter.") — the r11-advice
    # fixture: cutting the footer then leaves a trailing newline that a
    # period-append-only normalize would turn into a phantom standalone
    # '.' line ("body.\n."), which format_multiline_text must clean
    rows = [
        {
            "name": f"d{i}",
            "external_id": str(i),
            "document": _json.dumps(
                [f"unique body {i}", [] if i % 2 else {}, footer]
            ),
        }
        for i in range(4)
    ]
    rows.append(
        {
            "name": "solo",
            "external_id": "s",
            "document": _json.dumps("standalone text"),
        }
    )
    ids = e.upload("o", "c", rows)
    e.build_text_index("o", "c")

    rep = {
        r["line"]: r["n_docs"]
        for r in e.boilerplate_report("o", "c", min_df=3).collect()
    }
    assert rep == {f"{footer}.": 4}

    before = {
        r["document_id"]: r["payload_json"]
        for r in e.t["documents"].read().collect()
    }
    n = e.boilerplate_cut("o", "c", min_df=3)
    assert n == 4
    cid = e._category_id("o", "c")
    texts = {
        r["document_id"]: r["_text"]
        for r in e._category_doc_texts(cid).collect()
    }
    for i, did in enumerate(ids[:4]):
        assert texts[did] == f"unique body {i}."
    after = {
        r["document_id"]: r["payload_json"]
        for r in e.t["documents"].read().collect()
    }
    assert after[ids[4]] == before[ids[4]]  # untouched doc byte-exact
    assert e.boilerplate_report("o", "c", min_df=3).count() == 0
    # text index: the footer tokens no longer find the cut docs; the
    # surviving body tokens still do
    tpath = e._text_index_path(cid)
    foot_hits = {
        r["doc_id"]
        for r in bm25_search_stored(spark, tpath, "subscribe newsletter", k=9).collect()
    }
    assert not (foot_hits & set(ids[:4]))
    body_hits = {
        r["doc_id"]
        for r in bm25_search_stored(spark, tpath, "unique body", k=9).collect()
    }
    assert set(ids[:4]) <= body_hits
    with pytest.raises(ValueError, match="unknown"):
        e.boilerplate_cut("o", "nope")
    with pytest.raises(ValueError, match="unknown"):
        e.boilerplate_report("o", "nope")
    # min_df=1 marks every line hot (boilerplate_cut would rewrite the
    # whole category to empty-document markers) — validated at the
    # Engine, not just the service route (r11 advice)
    with pytest.raises(ValueError, match="min_df"):
        e.boilerplate_cut("o", "c", min_df=1)
    with pytest.raises(ValueError, match="min_df"):
        e.boilerplate_report("o", "c", min_df=0)


def test_format_multiline_text_matches_format_string(spark):
    """The boilerplate fixpoint's in-loop normalize
    (documents.format_multiline_text) must agree with the REAL storage
    normalization (documents._format_string) on every shape a line cut
    can produce: trailing newline after a final-line cut, empty lines
    from flatten's empty-list/empty-dict items, CRs smuggled in via
    dict keys, whitespace edges, and the empty document (r11 advice —
    the period-append-only hook produced phantom '.' lines here)."""
    from go_vectorsearch_spark.operators.documents import (
        EMPTY_DOC_MARKER,
        _format_string,
        format_multiline_text,
    )

    cases = [
        "a.\n",              # final line cut: trailing newline
        "a.\n\nhot footer.",  # empty line mid-document
        "a.\n\n",            # empty line + trailing newline
        "\nx.",              # leading newline after a first-line cut
        "",                  # fully-cut document -> marker
        "\n",                # only an empty line survived
        "  x  ",             # whitespace edges
        "k\r: v.",           # CR via a dict key
        "a.\n\n\n\nb.",      # excess newlines collapse
        "already ends.",     # idempotent passthrough
        "no period",         # ensure-trailing-period
        "a.\n.",             # phantom form itself, re-normalized
    ]
    assert _format_string("") == EMPTY_DOC_MARKER
    df = spark.createDataFrame([(s,) for s in cases], "t string")
    got = [
        r["out"]
        for r in df.select(
            format_multiline_text(F.col("t")).alias("out")
        ).collect()
    ]
    assert got == [_format_string(s) for s in cases]


def test_strip_boilerplate_fixpoint_no_phantom_period_line(spark):
    """The r11-advice scenario end-to-end at iterate=1: documents shaped
    'body.\\n\\nfooter.' (flatten of ["body", [], "footer"]) whose hot
    footer is the LAST line — the rebuild leaves 'body.\\n', and the
    full-expression normalize must store 'body.', never the phantom
    'body.\\n.' a period-append-only hook produced."""
    from go_vectorsearch_spark.operators.curation import (
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_multiline_text,
    )

    docs = [
        (1, "one body.\n\nhot footer."),
        (2, "two body.\n\nhot footer."),
        (3, "three body.\n\nhot footer."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = strip_boilerplate_fixpoint(
        df, min_df=3, iterate=1, normalize=format_multiline_text
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: "one body.", 2: "two body.", 3: "three body."}
    out.unpersist()


@pytest.mark.slow
def test_strip_boilerplate_fixpoint_matches_naive_reference(spark):
    """Distributed fixpoint ≡ an independent driver-side reference
    (hot-fit → strip → normalize-changed → freeze-emptied, looped) over
    seeded random small corpora with dense line sharing — the substring
    family's naive-reference discipline applied to the line family.
    Covers hot/empty/normalized-empty lines, period migration chains,
    and mass-emptied documents."""
    import random

    from go_vectorsearch_spark.operators.curation import (
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_rejoined_text,
    )

    def naive(docs: dict, min_df: int, iterate: int, normalize: bool):
        cur = dict(docs)
        done: dict = {}
        if normalize:  # pre-existing empty-document markers freeze upfront
            done = {i: t for i, t in cur.items() if t == "."}
            cur = {i: t for i, t in cur.items() if t != "."}
        for _ in range(iterate):
            df_count: dict = {}
            for t in cur.values():
                # Spark `trim` removes ASCII space ONLY — .strip(" "),
                # never .strip(), or the tabbed fixture line families
                # would merge here and nowhere else (r13)
                forms = {
                    ln.strip(" ").lower()
                    for ln in t.split("\n")
                    if ln.strip(" ").lower()
                }
                for nn in forms:
                    df_count[nn] = df_count.get(nn, 0) + 1
            hot = {nn for nn, c in df_count.items() if c >= min_df}
            if not hot:
                break
            nxt: dict = {}
            emptied = set()
            for i, t in cur.items():
                kept = [
                    ln for ln in t.split("\n")
                    if ln.strip(" ").lower() not in hot
                ]
                new = "\n".join(kept)
                if not normalize:
                    nxt[i] = new
                    continue
                if new == "":
                    emptied.add(i)
                if new != t:
                    new = new if new.endswith(".") else new + "."
                nxt[i] = new
            if normalize:
                for i in emptied:
                    done[i] = nxt.pop(i)
            cur = nxt
        cur.update(done)
        return cur

    # "\ta tab\t" pins the fit normalization's trim semantics on BOTH
    # paths: Spark `trim` removes ASCII space ONLY, so the tabbed form
    # is its own line family (a local path using Python .strip() would
    # merge it with "a tab" and diverge — r13, the adaptive-path risk)
    lines = ["alpha beta", "Alpha Beta", "  spaced  ", "", "tail.",
             "x y z", "q", "\ta tab\t", "a tab"]
    rejoined_py = lambda s: s if s.endswith(".") else s + "."  # noqa: E731

    def naive_fit_trim(ln: str) -> str:
        return ln.strip(" ").lower()

    for seed in range(8):
        rng = random.Random(seed)
        docs = {
            d: "\n".join(
                rng.choice(lines) for _ in range(rng.randint(1, 4))
            )
            for d in range(1, 8)
        }
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        for normalize in (False, True):
            want = naive(docs, min_df=2, iterate=4, normalize=normalize)
            # three engine configurations, one truth: the distributed
            # loop, the adaptive driver-local path (needs the scalar
            # normalize twin), and the gate overflowing back to
            # distributed at local_max_docs
            variants = [
                dict(_force_distributed=True),
                dict(normalize_py=rejoined_py if normalize else None),
                dict(normalize_py=rejoined_py if normalize else None,
                     local_max_docs=3),
            ]
            for kw in variants:
                out = strip_boilerplate_fixpoint(
                    df,
                    min_df=2,
                    iterate=4,
                    normalize=format_rejoined_text if normalize else None,
                    **kw,
                )
                got = {r["doc_id"]: r["text"] for r in out.collect()}
                out.unpersist()
                assert got == want, (seed, normalize, kw, docs)


def test_strip_boilerplate_fixpoint_marker_docs_invariant_across_calls(spark):
    """r11 review: pre-existing '.' empty-document markers (what an
    EARLIER mass-emptying cut stored) must freeze upfront — otherwise a
    second invocation would see the marker line as hot and strip
    legitimate '.' lines out of CONTENT documents, behaving differently
    from the first invocation on the same corpus."""
    from go_vectorsearch_spark.operators.curation import (
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_rejoined_text,
    )

    docs = [
        (1, "."), (2, "."), (3, "."),      # frozen markers (df 3)
        (4, "real content line.\n."),       # content doc WITH a '.' line
        (5, "other content here."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = strip_boilerplate_fixpoint(
        df, min_df=3, iterate=4, normalize=format_rejoined_text
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    out.unpersist()
    # markers untouched; doc 4's legitimate '.' line NOT stripped (the
    # marker family is excluded from the fit, and '.' among content
    # lines has df 1 on its own)
    assert got == {r[0]: r[1] for r in docs}


def test_engine_boilerplate_marker_runbook_terminates(spark, tmp_path):
    """A mass-emptying cut leaves >= min_df '.' marker documents; the
    report must NOT list the irremovable marker as hot (a report->cut
    runbook would loop forever on cut=0 / report non-empty — r11
    review)."""
    import json as _json

    from go_vectorsearch_spark.api import Engine

    e = Engine(spark, str(tmp_path))
    boiler = "every document is exactly this boilerplate"
    rows = [
        {"name": f"d{i}", "external_id": str(i),
         "document": _json.dumps(boiler)}
        for i in range(3)
    ]
    rows.append({"name": "k", "external_id": "k",
                 "document": _json.dumps("one real survivor text")})
    ids = e.upload("o", "c", rows)
    n = e.boilerplate_cut("o", "c", min_df=3)
    assert n == 3
    texts = {
        r["document_id"]: r["_text"]
        for r in e._category_doc_texts(e._category_id("o", "c")).collect()
    }
    assert all(texts[d] == "." for d in ids[:3])
    assert texts[ids[3]] == "one real survivor text."
    # runbook terminates: report empty, second cut rewrites nothing
    assert e.boilerplate_report("o", "c", min_df=3).count() == 0
    assert e.boilerplate_cut("o", "c", min_df=3) == 0


def test_strip_boilerplate_fixpoint_zero_cut_returns_persisted(spark):
    """r12 advice: a first-pass convergence (nothing hot) must STILL
    return a persisted+materialized frame — the documented contract
    callers rely on (Engine.boilerplate_cut feeds the result to the
    multi-action rewrite path; an unpersisted return re-ran the source
    plan per downstream action). Checked for both the normalize and
    plain branches, with the caller's release as the cleanup."""
    from go_vectorsearch_spark.operators.curation import (
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        format_rejoined_text,
    )

    df = spark.createDataFrame(
        [(1, "alpha."), (2, "beta."), (3, "gamma.")],
        "doc_id long, text string",
    )
    for normalize in (None, format_rejoined_text):
        out = strip_boilerplate_fixpoint(
            df, min_df=3, iterate=3, normalize=normalize
        )
        assert out.storageLevel.useMemory or out.storageLevel.useDisk, (
            "zero-cut fixpoint result came back unpersisted"
        )
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got == {1: "alpha.", 2: "beta.", 3: "gamma."}
        out.unpersist()


def test_format_multiline_scalar_twin_matches_expression(spark):
    """_format_multiline_string is the scalar twin of the
    format_multiline_text EXPRESSION — including where the expression
    diverges from the storage UDF: Java \\s is the ASCII class, so an
    NBSP edge survives the expression trim while _format_string's
    Unicode .strip() removes it (the r13 self-review scenario: a
    local-path fixpoint normalizing with the storage UDF would clean
    the same corpus differently than the distributed loop)."""
    from go_vectorsearch_spark.operators.documents import (
        _format_multiline_string,
        _format_string,
        format_multiline_text,
    )

    cases = [
        "", "x", "x.", "a\r\nb", "a\n\n\nb", "  edge  ", "\tedge\t",
        "a.\n", "body ", " lead", "a b\n\nc",
        "mix  \t \n tail",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "t string")
    got = [
        r["out"]
        for r in df.select(format_multiline_text(F.col("t")).alias("out")).collect()
    ]
    assert got == [_format_multiline_string(s) for s in cases]
    # ...and the divergence the twin exists for is REAL: the storage
    # UDF strips the NBSP edge the expression keeps
    assert _format_multiline_string("body ") == "body ."
    assert _format_string("body ") == "body."


def test_fixpoint_local_matches_distributed_on_unicode_whitespace(spark):
    """The boilerplate entry configuration (normalize =
    format_multiline_text + its scalar twin) must produce IDENTICAL
    text on the adaptive local path and the distributed loop when a cut
    leaves a non-ASCII-whitespace edge — the exact divergence passing
    _format_string as the twin would introduce (r13 self-review)."""
    from go_vectorsearch_spark.operators.curation import (
        strip_boilerplate_fixpoint,
    )
    from go_vectorsearch_spark.operators.documents import (
        _format_multiline_string,
        format_multiline_text,
    )

    docs = [
        (1, "one body \nhot footer"),
        (2, "two body \nhot footer"),
        (3, "three body \nhot footer"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    outs = []
    for kw in (dict(), dict(_force_distributed=True)):
        out = strip_boilerplate_fixpoint(
            df, min_df=3, iterate=3,
            normalize=format_multiline_text,
            normalize_py=_format_multiline_string,
            **kw,
        )
        outs.append({r["doc_id"]: r["text"] for r in out.collect()})
        out.unpersist()
    assert outs[0] == outs[1]
    # the NBSP edge survives normalization on BOTH paths (ASCII trim)
    assert outs[0][1] == "one body ."


def test_local_gate_rejects_duplicate_ids(spark):
    """A repeated id is invalid input either way, but the scalar
    mirrors key by id while the distributed plans process every row —
    the gate keeps duplicate-id corpora on the distributed path so the
    two paths can never report different row counts for the same bad
    input (r13 self-review)."""
    from go_vectorsearch_spark.operators.curation import (
        _bounded_local_rows,
    )

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    assert _bounded_local_rows(dup, "doc_id", "text", 100, 1 << 20) is None
    ok = spark.createDataFrame(
        [(1, "a"), (2, "c")], "doc_id long, text string"
    )
    assert _bounded_local_rows(ok, "doc_id", "text", 100, 1 << 20) is not None


def test_engine_boilerplate_cut_distributed_path_equivalent(
    spark, tmp_path, monkeypatch
):
    """The Engine's small test categories take the fixpoint's adaptive
    local path since r13, so the DISTRIBUTED-cut-fed rewrite machinery
    (partition-scoped upsert driven by a cluster-computed cut frame)
    would otherwise go untested at the Engine level. Run the same
    corpus through both paths into two stores and require identical
    stored texts and rewrite counts."""
    import json as _json

    from go_vectorsearch_spark.api import Engine
    from go_vectorsearch_spark.operators import curation as CUR

    footer = "shared footer line"
    rows = [
        {
            "name": f"d{i}",
            "external_id": str(i),
            "document": _json.dumps([f"unique body {i}", footer]),
        }
        for i in range(4)
    ]

    results = {}
    for mode in ("local", "distributed"):
        e = Engine(spark, str(tmp_path / mode))
        e.upload("o", "c", rows)
        if mode == "distributed":
            monkeypatch.setattr(
                CUR, "_bounded_local_rows", lambda *a, **k: None
            )
        n = e.boilerplate_cut("o", "c", min_df=3)
        cid = e._category_id("o", "c")
        texts = {
            r["document_id"]: r["_text"]
            for r in e._category_doc_texts(cid).collect()
        }
        results[mode] = (n, texts)
        monkeypatch.undo()
    assert results["local"] == results["distributed"]
    assert results["local"][0] == 4  # the cut really ran
