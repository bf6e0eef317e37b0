"""Z-order (Morton) clustering — multi-column data skipping at write.

A sorted layout prunes scans on ONE leading column: parquet row-group
min/max stats make `WHERE key = x` skip every file whose range excludes
x, but a second column's values still spread across all files. The
reference leans on per-column DB btrees instead (database/model.go);
the columnar analog for MULTIPLE filter columns is Z-ORDERING: map each
row to the Morton code of its columns' quantile buckets (bit
interleaving), then range-partition and sort by that code. Nearby
z-values are nearby in EVERY dimension, so each written file covers a
small min/max box in all clustered columns at once and a filter on ANY
of them skips most files.

The pieces, each scale-safe:

  * bucket boundaries come from ``approxQuantile`` — a sketch-merge
    aggregate, one pass, driver receives 2^bits doubles per column
    (equi-DEPTH buckets, so skewed columns still fill all buckets);
  * the bucket id is a codegen'd binary search over the boundary array
    Literal (fold over sorted boundaries);
  * bit interleave is a fold over bit positions (shift/or arithmetic);
  * ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` is the one
    (intentional) shuffle — the same write-once cost bucketing pays,
    amortized over every later pruned scan.

tests/test_zorder.py measures the property end-to-end: after z-order
writing, each file's footer min/max box covers a small fraction of both
columns' global ranges, and a point filter on EITHER column
stats-prunes most files — while a single-column sort layout only prunes
its leading column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: Column, boundaries: list[float], bits: int) -> Column:
    """Equi-depth bucket id of ``col`` in [0, 2^bits): the count of
    interior quantile boundaries <= value, found by a NESTED-when
    binary search over the sorted boundary list — each row evaluates
    one comparison per level (``bits`` total), not one per boundary
    (2^bits - 1; at bits=8 that fold was a 30x arithmetic multiplier
    on the clustering write's hot projection). NULLs map to bucket 0.
    """
    v = col.cast("double")

    def search(lo: int, hi: int) -> Column:
        # bucket id in [lo, hi] given boundaries[lo-1] <= v < boundaries[hi]
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(
            v >= F.lit(float(boundaries[mid - 1])), search(mid, hi)
        ).otherwise(search(lo, mid - 1))

    return F.coalesce(
        search(0, min((1 << bits) - 1, len(boundaries))), F.lit(0)
    ).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit j of column i lands at position j*len+i.

    Plain shift/add arithmetic (each output bit is set at most once, so
    + is |); the expression is O(bits x columns) nodes — tiny."""
    z = F.lit(0).cast("long")
    n = len(buckets)
    for i, bkt in enumerate(buckets):
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bkt, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return z


def zorder_code(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> Column:
    """The Morton code column for ``cols`` (numeric), using equi-depth
    buckets fit on ``df`` via approxQuantile (one sketch pass)."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder_code: {len(cols)} cols x {bits} bits = "
            f"{bits * len(cols)} interleaved bits exceeds a signed long; "
            "lower bits or cluster fewer columns"
        )
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    # one sketch job for ALL columns (approxQuantile merges per-column
    # KLL sketches in a single pass)
    all_bounds = df.approxQuantile(list(cols), probs, 0.001)
    buckets = [
        _bucket_expr(F.col(c), bounds, bits)
        for c, bounds in zip(cols, all_bounds)
    ]
    return _interleave(buckets, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` by the Morton code of ``cols`` and write parquet.

    ``num_files`` bounds the layout's granularity: each file covers
    ~1/num_files of the z-range, i.e. a box of roughly
    (1/num_files)^(1/len(cols)) of each column's value range — the
    knob trading file count against skip precision. One
    repartitionByRange shuffle (sampled range boundaries), sorted
    within partitions so row groups inside a file are boxes too.
    """
    z = zorder_code(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
