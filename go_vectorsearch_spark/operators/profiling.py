"""One-scan table profiler: per-column quality/shape statistics.

Extension beyond the reference engine (whose only introspection surface
is the boot ``prefTest`` micro-bench, main.go:256-285): before pointing
a 100 TB pipeline at a new corpus drop you profile it — null rates,
cardinalities, ranges, string lengths — and every one of those is a
mergeable aggregate, so the whole profile is ONE scan with map-side
partial aggregation and a single 1-row reduce. No per-column jobs, no
shuffle of data rows.

Output is LONG format (one row per profiled column) so the result
schema is stable regardless of the profiled table's width — the shape a
catalog or data-quality dashboard ingests directly.

Scale notes:
  * Distinct counts default to HyperLogLog++ (``approx_count_distinct``)
    — a fixed-size mergeable sketch. ``exact_distinct=True`` swaps in
    exact ``count(DISTINCT)`` for small tables and for engine-parity
    tests (HLL estimates are engine-specific; exact counts are not).
    Exact mode plans one expand + shuffle per profiled column — fine at
    validation scale, wrong at corpus scale; the default is the sketch.
  * min/max are cast to string AFTER aggregation: per-column, not
    per-row, so the cast cost is O(columns) and the long-format schema
    stays uniform across types.
  * The final explode of the packed struct array runs on the single
    aggregated row — driver-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
    quantiles: tuple[float, ...] = (),
) -> DataFrame:
    """Profile ``cols`` (default: every top-level column) in one pass.

    Returns one row per column:
      column        string  — column name
      dtype         string  — Spark simpleString of the type
      n_rows        long    — table row count (same for every row)
      n_nulls       long    — NULL count in this column
      n_distinct    long    — distinct non-null values (approx unless
                              ``exact_distinct``)
      min_value     string  — min, cast to string (NULL if all-NULL)
      max_value     string  — max, cast to string
      mean          double  — numeric columns only, else NULL
      avg_len       double  — string columns only: average length
      quantiles     array<double> — numeric columns, only when
                    ``quantiles`` is non-empty: ``percentile_approx`` at
                    the requested points (a mergeable t-digest-style
                    sketch — still one scan, still one aggregate pair)
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    by_name = {f.name: f for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        fld = by_name[c]
        q = f"`{c}`"
        aggs.append(F.count_if(F.col(q).isNull()).alias(f"_nulls_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(q)).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(q).alias(f"_dist_{c}"))
        aggs.append(F.min(q).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(q).cast("string").alias(f"_max_{c}"))
        if isinstance(fld.dataType, NumericType):
            aggs.append(F.avg(q).alias(f"_mean_{c}"))
            if quantiles:
                aggs.append(
                    F.percentile_approx(
                        F.col(q).cast("double"),
                        F.lit([float(p) for p in quantiles]),
                    ).alias(f"_qtl_{c}")
                )
        if isinstance(fld.dataType, StringType):
            aggs.append(F.avg(F.length(q)).alias(f"_len_{c}"))
    one = df.agg(*aggs)

    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(by_name[c].dataType.simpleString()).alias("dtype"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                (
                    F.col(f"_mean_{c}").cast("double")
                    if isinstance(by_name[c].dataType, NumericType)
                    else F.lit(None).cast("double")
                ).alias("mean"),
                (
                    F.col(f"_len_{c}").cast("double")
                    if isinstance(by_name[c].dataType, StringType)
                    else F.lit(None).cast("double")
                ).alias("avg_len"),
                *(
                    [
                        (
                            F.col(f"_qtl_{c}")
                            if isinstance(by_name[c].dataType, NumericType)
                            else F.lit(None).cast("array<double>")
                        ).alias("quantiles")
                    ]
                    if quantiles
                    else []
                ),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(packed).alias("p")).select("p.*")
