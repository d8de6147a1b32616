"""Interval-overlap join — equi-join on time bins instead of an
inequality join, so Catalyst plans a hash join, not a nested loop.

Two intervals overlap iff ``l_start <= r_end AND r_start <= l_end``.
Writing that directly as a join condition gives Catalyst nothing to
hash on (plus the optional key columns), which at fact×fact scale
degenerates to a broadcast-nested-loop or cartesian plan.  The scalable
formulation (the Flink/interval-join and spatial-binning pattern):

1. explode each interval into the fixed-width time bins it covers
   (``sequence(floor(start/w), floor(end/w))``),
2. equi-join on ``(keys..., bin)`` — a plain shuffled hash join,
3. keep each matched pair exactly once *without a distinct shuffle* by
   the first-common-bin trick: emit only where
   ``bin == floor(greatest(l_start, r_start) / w)`` — the one bin both
   sides share first,
4. re-check the exact overlap predicate (bins are a superset).

Cost: one shuffle per side on (keys, bin); fan-out per row is
``interval_length / bin_width + 1``, so choose ``bin_seconds`` near the
typical interval length.  No driver collect; skew in a hot bin is
handled by AQE skew-join splitting.

Reference analogue: none — the reference's only join shapes are
point-lookups and a driver-side dependency loop (SURVEY.md §2.A7);
this is part of the §2.D Spark-native surface (theta/range joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__overlap_bin"


def _explode_bins(df: DataFrame, start: str, end: str, bin_seconds: int) -> DataFrame:
    lo = F.floor(F.unix_timestamp(F.col(start)) / bin_seconds)
    hi = F.floor(F.unix_timestamp(F.col(end)) / bin_seconds)
    return df.withColumn(_BIN, F.explode(F.sequence(lo, hi)))


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str] = (),
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] intervals overlap,
    optionally restricted to equal values on the ``on`` key columns.

    ``left`` and ``right`` must not share column names apart from ``on``
    (alias/prefix beforehand).  Interval bounds are timestamp columns and
    are inclusive on both ends.  Each qualifying pair is returned exactly
    once.
    """
    on = list(on)
    dup = (set(left.columns) & set(right.columns)) - set(on)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}; rename before joining")

    lb = _explode_bins(left, left_start, left_end, bin_seconds)
    rb = _explode_bins(right, right_start, right_end, bin_seconds)

    cond = [lb[k] == rb[k] for k in on] + [lb[_BIN] == rb[_BIN]]
    joined = lb.join(rb, cond).drop(rb[_BIN], *[rb[k] for k in on])

    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = (ls <= re_) & (rs <= le)
    first_common_bin = F.floor(F.unix_timestamp(F.greatest(ls, rs)) / bin_seconds)
    return joined.filter(overlap & (F.col(_BIN) == first_common_bin)).drop(_BIN)
