"""SparkSession factory.

Tuned for the test harness (single JVM, local[32], 128 GiB) but every
setting is chosen to also be the right default on a real multi-executor
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (pandas-UDF fast path), shuffle partitions sized
to the parallelism rather than the Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark-vectorsearch") -> SparkSession:
    """Create (or reuse) the engine SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for the local core count so bench runs
    and tests share one code path.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle partitions ~ cores in local mode. On a 1000-executor
        # cluster this would scale with total cores; AQE coalescing makes
        # over-provisioning cheap, so err high there, low here.
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions by SIZE, not by keeping the
        # parallelism hint: small shuffles collapse to few tasks (less
        # scheduling), huge ones still fan out to the target size — the
        # right behavior at every scale, not a small-data hack
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite a sort-merge join to shuffled-hash AT RUNTIME
        # when every post-shuffle partition of the build side is under
        # 64 MB (default 0 = never). Size-gated per partition, so it is
        # scale-safe by construction: a big join's partitions exceed the
        # bound and stay sort-merge, a small one skips both sorts. A/B
        # on the join family (r14, interleaved min-of-3): jaccard pair
        # join −0.5 s, duplicate-flags join-back −0.18 s, span
        # duplicate-set −0.12 s, no entry slower. AQE skew-splitting
        # applies to shuffled-hash joins too.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = one JVM holds executors AND caches; a small heap
        # GC-thrashes once the bench has persisted indexes/shingle frames
        # (the harness box has 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Parquet blobs (documents) compress with zstd like the reference
        # stores payloads (database/compression.go:36-47) - free via codec.
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
