"""Testdata table loaders (S1/S2 of SURVEY.md §2.1).

The reference streams SQL tables in 1000-row batches
(reference: dnc/dnc.go:93-107, config/constants.go:6); in Spark a
parquet scan is already batched and partitioned, and Catalyst handles
projection pushdown (reference's hand-written ``.Select``,
dnc/dnc.go:97) and predicate pushdown for free - so the "scan
operator" here is just ``spark.read.parquet`` plus schema knowledge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Columnar parquet scan = batched scan S1."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
