"""SparkSession factory.

Single place where engine-wide Spark settings live so tests, bench and
the driver entry point all run with the same (scale-aware) config.

Scale notes (local[32] here, 1000-executor cluster in production):
- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- shuffle.partitions sized for local runs via env; on a real cluster
  AQE coalescing makes the initial number mostly a ceiling.
- Arrow on: every pandas_udf / mapInPandas transfer is Arrow-batched.
- UTC session timezone: deterministic timestamp semantics vs the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "etl_batch_spark", *, master: str | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pinned, not just Spark 4's default: fail-loud arithmetic /
        # array-index semantics are a correctness contract here (e.g.
        # similarity.multitable_topk relies on INVALID_ARRAY_INDEX for
        # ragged embeddings instead of silently reading bit 0)
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # INT64 micros instead of the legacy INT96: INT96 carries NO
        # parquet min/max statistics, which blinds both the built-in
        # scan-level row-group skipping and the TxTable commit-log
        # data skipping (read_where) for timestamp columns.  Every
        # modern engine (Delta, Iceberg, DuckDB) reads INT64 natively.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # InferFiltersFromGenerate turns explode(expensive_expr) into a
        # pre-filter `size(expr)>0 AND isnotnull(expr)` that (a) inlines
        # the generator input several times over and (b) gets pushed
        # below exchanges onto the scan side — for our shingle/token
        # pipelines that re-ran the whole tokenize+shingle expression 4x
        # per row in a single pre-shuffle task (measured 15s -> 1.5s on
        # dd04 at sf0.1).  Empty generator inputs are rare in every
        # pipeline here, so the skipped-row saving it exists for is
        # noise by comparison, at any scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
