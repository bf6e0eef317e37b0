"""Calm-window paired core-count scaling capture (r13 verdict task 7).

Runs the oracle subset per-query at TWO core counts back-to-back in the
same weather window, recording the single-thread cpu_score before /
between / after so a reader can tell compute scaling from host noise.
The driver's own 8-vs-32 PERF probe samples hours apart, where this
box's weather swing (±30%, BASELINE.md) swamps the core signal; pairing
the runs minutes apart inside one process is the controlled version of
that measurement.

Usage: python tools/scaling_capture.py [sf_dir] [low_cpus] [high_cpus]
Prints a per-query table and a classification: compute-scaled (low/high
wall ratio >= 1.5), floor-bound (ratio ~1), or noise.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_score() -> float:
    import hashlib

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.3:
        hashlib.md5(str(n).encode()).digest()
        n += 1
    return round(n / ((time.perf_counter() - t0) * 1000), 1)


def run_at(cpus: int, sf_dir: str) -> dict:
    """One full oracle-subset pass at `cpus` cores, fresh JVM."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from go_vectorsearch_spark import get_spark
    from go_vectorsearch_spark import queries as registry

    spark = get_spark(f"scaling-c{cpus}")
    # warm like bench.py: UDF worker fork + codegen + createDataFrame,
    # synthetic data only
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    spark.createDataFrame([(1, 1.0)], "a long, b double").collect()
    # builds (billed separately by bench.py; here they just warm caches)
    for b in (
        registry._ivf_index,
        registry._toks_cached,
        registry._shingled_cached,
        registry._lsh_bucketed_cached,
        registry._substr_windows_cached,
        registry._substr_flags_cached,
        registry._pq_cached,
        registry._pca_cached,
        registry._pca_exact_cached,
        registry._bm25_cached,
        registry._bpe_merges_cached,
        registry._ngram_lm_cached,
    ):
        b(spark, sf_dir)
    timings = {}
    floor = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1).collect()
        floor.append(time.perf_counter() - t0)
    oracle = {n for n, s in registry.REGISTRY.items() if s.oracle is not None}
    for name in sorted(oracle):
        t0 = time.perf_counter()
        registry.REGISTRY[name].fn(spark, sf_dir).toPandas()
        timings[name] = round(time.perf_counter() - t0, 3)
    out = {"cpus": cpus, "floor": round(sorted(floor)[1], 4), "queries": timings}
    spark.stop()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    s0 = _cpu_score()
    r_low = run_at(low, sf_dir)
    s1 = _cpu_score()
    r_high = run_at(high, sf_dir)
    s2 = _cpu_score()
    print(json.dumps({"cpu_score": [s0, s1, s2],
                      "floor": [r_low["floor"], r_high["floor"]]}))
    print(f"{'query':32s} {f'c{low}':>8s} {f'c{high}':>8s} {'ratio':>6s}  class")
    rows = []
    for n in sorted(r_low["queries"]):
        a, b = r_low["queries"][n], r_high["queries"][n]
        ratio = a / b if b > 0 else float("inf")
        cls = (
            "compute-scaled" if ratio >= 1.5
            else "floor-bound" if 0.67 <= ratio <= 1.5
            else "noise(inverted)"
        )
        rows.append((n, a, b, ratio, cls))
        print(f"{n:32s} {a:8.3f} {b:8.3f} {ratio:6.2f}  {cls}")
    tl = sum(r[1] for r in rows)
    th = sum(r[2] for r in rows)
    print(f"{'TOTAL':32s} {tl:8.3f} {th:8.3f} {tl / th:6.2f}")


if __name__ == "__main__":
    main()
