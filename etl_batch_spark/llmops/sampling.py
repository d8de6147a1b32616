"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and row order — a
repartition or a source re-split silently changes which rows are kept.
These operators decide membership from a *content hash* of a stable key,
so the sample is a pure function of (key, salt, fraction): reproducible
across runs, clusters, engines, and partitionings; new rows don't
disturb the membership of old rows (consistent sampling); and a row's
fate for fraction f1 < f2 is nested (the f1 sample is a subset of the
f2 sample), which is what ablation ladders need.

All hashing is the engine-wide md5-60bit (``dedup.H60``), so oracles
can replay membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_batch_spark.llmops.dedup import H60

_BUCKETS = 1_000_000


def hash_bucket(key_col: str, *, salt: str = "s0") -> Column:
    """Uniform bucket in [0, 1e6) from (salt, key) — the sampling die."""
    expr = H60.format(expr=f"concat('{salt}', '|', cast({key_col} as string))")
    return F.pmod(F.expr(expr), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, *, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by key hash.
    Narrow map + filter: no shuffle, no state, pushdown-friendly."""
    return df.filter(hash_bucket(key_col, salt=salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    *,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum reproducible sampling — the training-mix primitive
    ("keep 100% of books, 10% of web, 0% of the rest").  The per-row
    threshold is a small CASE over ``strata_col``; membership still
    depends only on (salt, key), so changing one stratum's fraction
    never reshuffles another stratum's sample."""
    thresh: Column = F.lit(int(default_fraction * _BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(hash_bucket(key_col, salt=salt) < thresh)
