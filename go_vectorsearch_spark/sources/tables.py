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
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Scan one testdata table. Columnar parquet scan = batched scan S1.

    The driver's ``events`` parquet stores TIMESTAMP(NANOS), which Spark
    rejects by default; read it as int64 nanos and truncate to
    microseconds (exactly what DuckDB's micros TIMESTAMP does), so both
    engines see identical values. The conf is set at read time because
    the driver supplies its own SparkSession.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
