"""Slowly-changing-dimension (type 2) merge — the warehouse-ETL core
operation the reference's batches feed (its control plane schedules
loads; this is the load).

``scd2_merge`` applies an update batch to the current snapshot of a
dimension, producing the new version set: changed keys get their open
row closed (``valid_to`` = effective date, ``is_current`` = false) and a
new open row; new keys get an open row; untouched keys pass through.

Scale: one shuffle on the dimension key joins snapshot and updates;
every branch (changed / unchanged / inserted) derives from that single
join — no second pass over the snapshot.  At 100 TB-dimension scale the
snapshot is bucketed on the key so the daily merge is exchange-free
(`operators/joins.py::write_bucketed`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_attr_differs(attrs: Sequence[str]) -> Column:
    cond = F.lit(False)
    for a in attrs:
        # null-safe inequality: a change to/from NULL is a change
        cond = cond | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    return cond


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    attrs: Sequence[str],
    effective_date: str,
) -> DataFrame:
    """Return the post-merge version set.

    ``current`` must carry ``valid_from``, ``valid_to`` (null = open) and
    ``is_current``; ``updates`` carries the key + tracked ``attrs``.
    ``effective_date`` (ISO day string) stamps closes and opens.

    PRECONDITION (same as ``merge.merge_dataframes``): ``updates`` has
    at most ONE row per key.  Duplicate update keys would fan the
    full-outer join out and emit several ``is_current`` rows for the
    same dimension key, corrupting the one-open-row invariant — capture
    pipelines batching multiple changes per key must pre-reduce to the
    latest change (e.g. ``cdc.apply_changelog``) before calling this.
    """
    eff = F.lit(effective_date).cast("date")
    cur = current.alias("cur")
    upd = updates.alias("upd")
    joined = cur.filter(F.col("is_current")).join(
        upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer"
    )
    changed_keys = joined.filter(
        F.col(f"cur.{key}").isNotNull()
        & F.col(f"upd.{key}").isNotNull()
        & _any_attr_differs(attrs)
    )
    inserted = joined.filter(F.col(f"cur.{key}").isNull())

    closed = changed_keys.select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed_keys.select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    fresh = inserted.select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # untouched: historical rows plus current rows with no effective change
    changed_ids = changed_keys.select(F.col(f"cur.{key}").alias(key))
    untouched = current.join(
        F.broadcast(changed_ids).withColumnRenamed(key, "_chg_key"),
        (F.col(key) == F.col("_chg_key")) & F.col("is_current"),
        "left_anti",
    ).select(key, *attrs, "valid_from", "valid_to", "is_current")

    return untouched.unionByName(closed).unionByName(opened).unionByName(fresh)
