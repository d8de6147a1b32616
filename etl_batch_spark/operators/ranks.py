"""Scale-safe global ranking.

A bare ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses
the whole input onto ONE task (`WindowExec: No Partition Defined`) — fine
on a bounded aggregate, a cluster-killer on a growing table.  The
scale-safe equivalent splits the keyspace into contiguous range slices
(sampled boundaries, same mechanism as sources/io.py::write_range_sorted),
ranks inside each slice in parallel, and re-bases each slice by the total
row count of the slices before it:

    global_rank(row) = local_rank(row within slice) + rows_in_earlier_slices

The per-slice counts are a ``num_partitions``-row aggregate — the only
serial step, and it is O(#partitions), not O(#rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFFSET = "__gr_offset"


def global_row_number(
    df: DataFrame,
    sort_cols: list[Column],
    out_name: str,
    *,
    partition_cols: "list[str] | None" = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Append a 1-based row number ordered by ``sort_cols``.

    With ``partition_cols`` the numbering restarts per partition value —
    the scale-safe form of ``ROW_NUMBER() OVER (PARTITION BY p ORDER BY s)``
    when the partition key is LOW-cardinality (each group would otherwise
    be one task); the range slicing spreads every group across slices and
    the per-(group, slice) count aggregate (|groups| × num_partitions rows)
    re-bases the local ranks.

    ``sort_cols`` are ordering expressions (``col.asc_nulls_first()`` etc.)
    and should form a total order (include a unique tiebreak column) so the
    numbering is deterministic regardless of how range boundaries split
    duplicate keys.  Two shuffles (range repartition + per-slice window),
    both parallel; no single-task global sort at any scale.
    """
    parts = list(partition_cols or [])
    # Partition values lead the range ordering so each (group, slice) pair
    # is contiguous in slice order and offsets re-base correctly.
    range_cols = [F.col(p).asc_nulls_first() for p in parts] + list(sort_cols)
    sliced = df.repartitionByRange(num_partitions, *range_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    w_local = Window.partitionBy(_PID, *parts).orderBy(*sort_cols)
    local = sliced.withColumn(_LOCAL, F.row_number().over(w_local))

    # Slice sizes: |groups| × num_partitions rows — the bounded serial
    # step.  The unpartitioned (or group-partitioned) window here runs
    # over that tiny aggregate, not the data.
    counts = local.groupBy(_PID, *parts).agg(F.count(F.lit(1)).alias("__gr_n"))
    w_off = (
        Window.partitionBy(*parts).orderBy(_PID)
        if parts
        else Window.orderBy(_PID)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID,
        *parts,
        F.coalesce(F.sum("__gr_n").over(w_off), F.lit(0)).alias(_OFFSET),
    )

    # Null-safe equi-join: a nullable partition column must still match its
    # own NULL group in the offsets table.
    renamed = offsets
    for c in (_PID, *parts):
        renamed = renamed.withColumnRenamed(c, f"__gr_r_{c}")
    cond = F.col(_PID) == F.col(f"__gr_r_{_PID}")
    for p in parts:
        cond = cond & F.col(p).eqNullSafe(F.col(f"__gr_r_{p}"))
    return (
        local.join(F.broadcast(renamed), cond, "left")
        .withColumn(out_name, (F.col(_LOCAL) + F.col(_OFFSET)).cast("int"))
        .drop(_PID, _LOCAL, _OFFSET, *[f"__gr_r_{c}" for c in (_PID, *parts)])
    )
