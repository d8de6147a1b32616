"""Join strategies for skewed and shuffle-heavy workloads.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime; these operators cover the cases AQE cannot:

- :func:`salted_join` — explicit key salting for pathological hot keys
  (one key holding >1 executor's worth of rows).  AQE splits skewed
  *partitions*, but a single hot key still lands in one task when the
  other side must be shuffled too; salting replicates the small side
  across ``n_salts`` sub-keys so the hot key fans out over the cluster.
- :func:`write_bucketed` / :func:`bucketed_join_tables` — co-located
  joins for tables that are joined repeatedly on the same key (the
  fact-to-fact case where neither side broadcasts).  Bucketing pays one
  shuffle at write time and then every subsequent join is
  exchange-free — at 100 TB that converts the dominant per-query cost
  into a one-time ingest cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has pathological key skew and ``small``
    is too large to broadcast.  Each big-side row gets a deterministic
    salt in [0, n_salts); the small side is replicated once per salt
    value; the join runs on (keys + salt), spreading every hot key over
    ``n_salts`` shuffle partitions.  Result is identical to the unsalted
    join — the salt only refines the partitioning, never the match.

    Cost model: small side shuffles n_salts× its size — choose
    ``n_salts`` ≈ (hot-key rows / rows-per-task target), not larger.
    Supported ``how``: inner / left (the replicated side must be the
    lookup side, so right/full would double-count unmatched rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    spark = big.sparkSession
    # deterministic per-row salt from the whole row of key values plus a
    # uniform spreader; monotonically_increasing_id is partition-layout
    # dependent, which is fine — any assignment is correct.
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, keys + ["__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str] | str,
    n_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``keys``.

    Both sides of a repeated fact-to-fact join written with the same
    (keys, n_buckets) join with **zero exchanges**: the scan itself
    reports the hash partitioning, so Catalyst plans a sort-merge join
    straight off the files.  ``n_buckets`` bounds per-bucket file size —
    at 100 TB size it so a bucket ≈ one task's worth (128–512 MB)."""
    keys = [on] if isinstance((on := keys), str) else list(keys)
    w = df.write.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join_tables(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables (see :func:`write_bucketed`)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
