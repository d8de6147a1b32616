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
    # the repo-wide reproducibility discipline.
    w = W.partitionBy(*keys).orderBy(
        F.col(_SEQ).desc_nulls_last(),
        F.when(F.col(_OP) == "D", 0).otherwise(1).asc(),
        F.xxhash64(*value_cols).asc(),
    )
    return (
        base.unionByName(chg)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(_OP) != "D"))
        .select(*value_cols)
    )
