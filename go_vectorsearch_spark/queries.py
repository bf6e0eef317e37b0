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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: brute-force cosine top-k search (SURVEY.md §2.3 J4 + §2.5 T2).
# Reference: server/search.go:234-273 - score every embedding against the
# query, dedup by document keeping the best score, keep top-k.
# Query vector = the stored embedding of vec_id 0 (deterministic).
# ---------------------------------------------------------------------------

TOPK_K = 10


@register(
    "cosine_topk",
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
    doc="J4/T2 brute-force cosine top-k (reference server/search.go:234-273)",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    topk = brute_force_topk(emb, qvec, TOPK_K, id_col="vec_id", vec_col="embedding")
    return topk.select("vec_id", F.round("score", 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle.strip()
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
