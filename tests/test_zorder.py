"""Z-order clustering: the multi-column data-skipping property.

Measured from the parquet footers the layout actually wrote — not from
the plan: after ``write_zordered(cols=(a, b))``, each file's min/max
box must cover a small fraction of BOTH columns' global ranges, so a
point filter on either column can stats-skip most files. The control
is a single-column sorted write: perfect skipping on the sort column,
none on the other — exactly the gap z-ordering closes.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.sources.zorder import write_zordered

COLS = ("l_partkey", "l_suppkey")


def _file_boxes(path: str, cols) -> list[dict]:
    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        boxes.append({c: (lo[c], hi[c]) for c in cols})
    return boxes


def _mean_span_fraction(boxes, col, global_lo, global_hi) -> float:
    width = global_hi - global_lo
    spans = [(b[col][1] - b[col][0]) / width for b in boxes]
    return sum(spans) / len(spans)


@pytest.fixture(scope="module")
def layouts(spark, sf_correct, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet").select(*COLS)
    write_zordered(li, str(base / "z"), COLS, bits=6, num_files=16)
    # control: plain sort by the FIRST column only
    (
        li.repartitionByRange(16, F.col(COLS[0]))
        .sortWithinPartitions(COLS[0])
        .write.mode("overwrite")
        .parquet(str(base / "sorted"))
    )
    stats = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in COLS],
        *[F.max(c).alias(f"hi_{c}") for c in COLS],
    ).head()
    rng = {c: (stats[f"lo_{c}"], stats[f"hi_{c}"]) for c in COLS}
    return str(base), rng


def test_zorder_boxes_are_tight_in_both_columns(layouts):
    base, rng = layouts
    zboxes = _file_boxes(f"{base}/z", COLS)
    assert len(zboxes) >= 8
    for c in COLS:
        frac = _mean_span_fraction(zboxes, c, *rng[c])
        # each file covers a minority of EITHER column's range; a random
        # (unclustered) layout would cover ~100% of both
        assert frac < 0.6, f"{c}: mean box span fraction {frac:.2f}"


def test_single_sort_control_shows_the_gap(layouts):
    base, rng = layouts
    sboxes = _file_boxes(f"{base}/sorted", COLS)
    lead = _mean_span_fraction(sboxes, COLS[0], *rng[COLS[0]])
    other = _mean_span_fraction(sboxes, COLS[1], *rng[COLS[1]])
    assert lead < 0.2, f"sorted layout should be tight on its sort col: {lead:.2f}"
    assert other > 0.8, f"and cover ~all of the other col: {other:.2f}"


def test_point_filter_skips_most_zordered_files(layouts):
    base, rng = layouts
    zboxes = _file_boxes(f"{base}/z", COLS)
    for c in COLS:
        lo, hi = rng[c]
        probe = (lo + hi) // 2
        touched = sum(1 for b in zboxes if b[c][0] <= probe <= b[c][1])
        assert touched <= len(zboxes) * 0.6, (
            f"point filter on {c} touches {touched}/{len(zboxes)} files"
        )


def test_zorder_rejects_bit_overflow(spark, sf_correct):
    from go_vectorsearch_spark.sources.zorder import zorder_code

    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zorder_code(li, ["l_partkey"] * 8, bits=8)


def test_bucket_search_equals_boundary_count(spark):
    """The nested-when binary search must equal 'count of boundaries
    <= value' (the fold it replaced) on the shapes approxQuantile can
    emit: duplicated boundaries (skewed columns), values exactly ON a
    boundary, below-min, above-max, and NULL (bucket 0)."""
    import numpy as np

    from go_vectorsearch_spark.sources.zorder import _bucket_expr
    from pyspark.sql import functions as F

    bits = 4
    rng = np.random.default_rng(5)
    # 15 interior boundaries with runs of duplicates
    base = sorted(rng.integers(0, 8, size=(1 << bits) - 1).astype(float))
    values = sorted(
        {float(v) for v in base}
        | {b + 0.5 for b in range(9)}
        | {-10.0, 100.0}
    )
    rows = [(i, v) for i, v in enumerate(values)] + [(999, None)]
    df = spark.createDataFrame(rows, "i long, v double")
    got = {
        r["i"]: r["b"]
        for r in df.withColumn("b", _bucket_expr(F.col("v"), base, bits)).collect()
    }
    for i, v in rows:
        if v is None:
            want = 0
        else:
            want = min(sum(1 for b in base if v >= b), (1 << bits) - 1)
        assert got[i] == want, (i, v, got[i], want)
