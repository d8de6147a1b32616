"""Incremental view maintenance: apply a change feed to stored partials.

Closes the loop between the transaction-log table's ``changes()`` feed
(sources/txlog.py) and the continuous-aggregate partials family
(operators/rollup.py): instead of recomputing an aggregate table after
every commit, fold the feed into it.

Two cost tiers, chosen by what the feed contains:

- **insert-only feed** (the append-only fast path ``changes()`` already
  resolves from log metadata): pure incremental — (n, sum) add the
  deltas, (min, max) merge the feed's extrema.  No read of the base
  table at all; cost is O(changed rows).
- **feed with deletes** (overwrites): n/sum are subtractable, but
  min/max are not — the standard IVM treatment recomputes exactly the
  TOUCHED (bucket, key) groups from the new snapshot and keeps every
  untouched group's stored row.  At scale the recompute scan prunes to
  the touched buckets (time-partitioned tables prune by partition).

Either way the result is bit-identical to a from-scratch rebuild —
asserted by the tests, which drive real TxTable commits through
``changes()`` into this fold.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_batch_spark.operators.rollup import _LEVEL_FMT, _partials_from_raw


def _nullsafe_cond(left: DataFrame, right: DataFrame, keys: "Sequence[str]"):
    """AND of null-safe equalities — groupBy treats NULL as a real group,
    so the partials-merge joins must too (a plain USING join would split
    a NULL-keyed group into two rows where a rebuild gives one)."""
    return reduce(
        lambda a, b: a & b, [left[k].eqNullSafe(right[k]) for k in keys]
    )


def apply_feed(
    partials: DataFrame,
    feed: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    value_col: str = "value",
    level: str = "day",
    raw: DataFrame | None = None,
) -> DataFrame:
    """New partials table after applying ``feed`` (rows carrying
    ``_change_type`` in {'insert', 'delete'}) to ``partials``.

    ``raw`` — the post-change snapshot — is required only when the feed
    contains deletes (min/max recompute for touched groups).  Groups
    whose count reaches zero are dropped, like a rebuild would.
    """
    if level not in _LEVEL_FMT:
        # fail like the delete path's _partials_from_raw would — Spark's
        # date_trunc returns NULL for unknown units, which would silently
        # collapse the whole feed into one (NULL, key) group
        raise KeyError(f"unknown level {level!r}; one of {sorted(_LEVEL_FMT)}")
    keys = ["bucket", *key_cols]
    # the feed is consumed 2-3 times (deletes probe + fold / touched-set)
    # and is often an expensive exceptAll diff — materialize it once
    feed = feed.localCheckpoint(eager=True)
    has_deletes = (
        feed.filter(F.col("_change_type") == "delete").limit(1).count() > 0
    )
    bucketed = feed.withColumn(
        "bucket", F.date_trunc(_LEVEL_FMT[level], F.col(ts_col))
    )

    if not has_deletes:
        ins = bucketed.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("d_n"),
            F.sum(value_col).alias("d_sum"),
            F.min(value_col).alias("d_min"),
            F.max(value_col).alias("d_max"),
        )
        # rename the delta's key columns before the full outer join:
        # dataset[col] disambiguation breaks when partials and the feed
        # derive from the SAME scan (Spark flags the coalesce select as
        # an ambiguous self-join — caught by the e0 empty corpus, where
        # an empty feed takes this path with shared lineage); renamed
        # columns are unambiguous whatever the lineage
        for k in keys:
            ins = ins.withColumnRenamed(k, f"_d_{k}")
        cond = reduce(
            lambda a, b: a & b,
            [partials[k].eqNullSafe(F.col(f"_d_{k}")) for k in keys],
        )
        return (
            partials.join(ins, cond, "full_outer")
            .select(
                *[F.coalesce(F.col(k), F.col(f"_d_{k}")).alias(k) for k in keys],
                (F.coalesce("n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n"),
                # null-aware add WITHOUT a typed zero literal: a 0.0
                # coalesce would coerce an integer/decimal sum to double
                # (breaking the bit-identical-to-rebuild contract and
                # schema-compatible appends), and would turn an all-NULL
                # group's sum into 0.0 where a rebuild gives NULL
                F.when(F.col("sum_v").isNull(), F.col("d_sum"))
                .when(F.col("d_sum").isNull(), F.col("sum_v"))
                .otherwise(F.col("sum_v") + F.col("d_sum"))
                .alias("sum_v"),
                F.least(
                    F.coalesce("min_v", F.col("d_min")),
                    F.coalesce("d_min", F.col("min_v")),
                ).alias("min_v"),
                F.greatest(
                    F.coalesce("max_v", F.col("d_max")),
                    F.coalesce("d_max", F.col("max_v")),
                ).alias("max_v"),
            )
        )

    if raw is None:
        raise ValueError("feed contains deletes: pass raw=<post-change snapshot>")
    touched = bucketed.select(*keys).distinct()
    fresh = _partials_from_raw(
        raw, ts_col=ts_col, key_cols=key_cols, value_col=value_col, level=level
    )
    recomputed = fresh.join(
        touched, _nullsafe_cond(fresh, touched, keys), "left_semi"
    )
    untouched = partials.join(
        touched, _nullsafe_cond(partials, touched, keys), "left_anti"
    )
    return untouched.unionByName(recomputed)
