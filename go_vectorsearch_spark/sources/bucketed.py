"""Bucketed table layout — shuffle-free co-located equi-joins.

The reference's biggest repeated join is embeddings ⋈ documents on the
FK (dnc/dnc.go:40-42, 95-97; server/search.go:285-308); it leans on DB
btree indexes. The Spark-native analog at the 100 TB design point is
BUCKETING: write both tables ``bucketBy(N, key)`` so rows with equal
keys land in the same bucket file on both sides. A later equi-join on
that key then reads bucket i of each side into the same task — a
SortMergeJoin with NO Exchange on either side. The join that would
shuffle both tables on every query instead shuffles at WRITE time,
once, amortized over every subsequent join/groupBy on the key.

What Spark needs for the shuffle to disappear (all handled here):

  * both sides bucketed on the join key with the SAME bucket count
    (mismatched counts shuffle the smaller-bucketed side);
  * the tables registered in the catalog — bucket metadata lives
    there, not in parquet footers, so ``spark.read.parquet`` on the
    same files would NOT know about the buckets
    (``option("path", ...)`` + ``saveAsTable`` keeps the data at an
    explicit location with catalog metadata on top);
  * ``sortBy`` on the key: each bucket file is written key-sorted.
    Spark 3+ no longer consumes the sort metadata at read by default
    (spark.sql.legacy.bucketedTableScan.outputOrdering), so the
    SortMergeJoin keeps a per-task Sort — but it runs over an
    already-sorted single-file bucket (near-linear) and the sorted
    layout also run-length-compresses the key column. The EXCHANGE is
    what costs at 100 TB, and that is gone.

groupBy(key) on a bucketed table likewise aggregates without an
Exchange — bucketing is pre-partitioning for EVERY downstream
key-aligned operator, not just joins.

tests/test_bucketed.py asserts the no-Exchange plan property and
value-equality against the plain shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, per-bucket-sorted catalog table.

    ``path`` pins the data location (external table) — recommended, so
    the data's lifecycle is the caller's and the catalog only carries
    the bucket metadata. ``num_buckets`` must match across every table
    this one will join with on ``bucket_col``; size it so one bucket of
    the LARGEST such table fits a task comfortably (rows/num_buckets ·
    row width ≈ 100–500 MB at the 100 TB point).
    """
    from pyspark.sql import functions as F

    # ONE file per bucket: repartition on the bucket key with the bucket
    # count (same Murmur3 hash as the bucketer) so each write task holds
    # exactly one bucket's rows. Spark 3+ keeps the SortMergeJoin's
    # per-task Sort either way (see module docstring) — but over a
    # single already-sorted file it is a near-linear pass, while
    # multi-file buckets would pay a real merge-sort per task.
    w = (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (a path read would
    drop the bucket metadata and re-shuffle on the next join)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key.

    With both sides bucketed on the join key at equal bucket counts,
    the physical plan is a SortMergeJoin whose children are bucketed
    scans — no Exchange on either side. Falls back gracefully (plain
    shuffled join, same rows) when the bucket layouts don't line up.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
