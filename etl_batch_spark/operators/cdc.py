"""CDC changelog application — the inverse of et08's snapshot diff.

``apply_changelog(snapshot, changes)`` folds an ordered I/U/D change
stream onto a base snapshot and returns the resulting snapshot:
the reference's UPDATE-in-place monitor semantics (SURVEY.md §2.A15)
generalized to data-plane tables, in the engine's append-only idiom —
the same latest-event-wins view `orchestration/store.py` uses for the
control plane, promoted to an operator.

Shape: union the snapshot (as seq -∞ upserts) with the changelog, one
``row_number`` window per key ordered by seq descending, keep the
latest row, drop deletes.  One shuffle on the key columns regardless
of changelog size; no driver state.  At 100 TB the snapshot side
arrives partitioned by key (bucketed layout) and AQE handles change
skew; deletes fold in the same pass — no separate anti join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SEQ = "__cdc_seq"
_OP = "__cdc_op"


def _tie_break_hash(df: DataFrame, cols: Sequence[str]) -> F.Column:
    """Deterministic per-row hash over ``cols`` for tie-breaking.

    ``xxhash64`` rejects MapType (and anything nesting one) at analysis
    time — maps have no canonical element order to hash.  Such columns
    go through ``to_json`` first: Spark serializes map entries in their
    stored order, which is stable for a given row, so the hash stays
    deterministic per run — all the tie-break needs.  Hashable columns
    pass through untouched, preserving the hash (and thus the chosen
    survivor) for every schema that worked before.
    """
    from pyspark.sql import types as T

    def hashable(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    exprs = [
        F.col(c) if hashable(df.schema[c].dataType) else F.to_json(F.col(c))
        for c in cols
    ]
    return F.xxhash64(*exprs)


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    *,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """Return the snapshot after applying ``changes`` in ``seq_col`` order.

    ``changes`` carries the full row image per change plus ``op_col``
    ('I'/'U' upsert, 'D' delete) and ``seq_col`` (monotone per key —
    commit LSN, kafka offset, event time).  Later changes win; a delete
    removes the key unless a later upsert re-inserts it.  ``snapshot``
    must have exactly the value columns of ``changes`` minus op/seq.
    """
    keys = list(keys)
    value_cols = [c for c in changes.columns if c not in (seq_col, op_col)]
    if set(value_cols) != set(snapshot.columns):
        raise ValueError(
            f"snapshot columns {sorted(snapshot.columns)} != changelog value "
            f"columns {sorted(value_cols)}"
        )
    base = snapshot.select(
        *value_cols,
        F.lit(None).cast(changes.schema[seq_col].dataType).alias(_SEQ),
        F.lit("U").alias(_OP),
    )
    chg = changes.select(
        *value_cols, F.col(seq_col).alias(_SEQ), F.col(op_col).alias(_OP)
    )
    # nulls_first: the seq -∞ snapshot rows sort oldest.  Ties on seq
    # (event-time sequences, unlike LSNs, can collide) break
    # DETERMINISTICALLY: deletes beat upserts (a 'D' sharing a seq with
    # a 'U' means the key ends deleted), then a stable value-hash — so
    # the same input yields the same survivor on every run/partitioning,
    # the repo-wide reproducibility discipline.  Map-typed value columns
    # hash via their JSON image (_tie_break_hash) — xxhash64 alone would
    # reject them at analysis time.
    union = base.unionByName(chg)
    w = W.partitionBy(*keys).orderBy(
        F.col(_SEQ).desc_nulls_last(),
        F.when(F.col(_OP) == "D", 0).otherwise(1).asc(),
        _tie_break_hash(union, value_cols).asc(),
    )
    return (
        union
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(_OP) != "D"))
        .select(*value_cols)
    )
