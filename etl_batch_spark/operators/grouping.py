"""SQL-standard empty-input semantics for grouping-set aggregates.

Spark's ``rollup`` / ``cube`` / ``groupingSets`` — DataFrame and SQL
forms alike (verified on Spark 4.1) — return ZERO rows over empty
input.  The SQL standard (and DuckDB / Postgres) instead mandate that
any grouping-set list containing the empty set ``()`` emit one
grand-total row even over empty input, exactly like a global
aggregate: ``COUNT(*)`` is 0, ``SUM`` is NULL, ``GROUPING`` flags are
all 1.

``ensure_grand_row`` restores the standard semantics without touching
the aggregation plan and without a second full scan: the fallback row
is anti-joined against a ``limit(1)`` emptiness probe of the source,
so on non-empty data the probe reads at most one input split, the
broadcast anti-join drops the fallback, and the result is bit-identical
to the plain rollup.  Only on genuinely empty input (where every scan
is trivially cheap) does the fallback row survive.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_grand_row"]

_PROBE = "_nonempty_probe"


def ensure_grand_row(
    grouped: DataFrame,
    source: DataFrame,
    values: Mapping[str, object],
) -> DataFrame:
    """Union the SQL-standard ``()`` grand-total row onto ``grouped``
    when (and only when) ``source`` is empty.

    ``grouped`` is the finished rollup/cube/grouping-sets result;
    ``source`` is the frame it aggregated (probe it BEFORE the heavy
    aggregation, not after — ``source.limit(1)`` is the cheap side).
    ``values`` supplies the fallback cell per output column — literals
    or Columns; any column not named falls back to a typed NULL, which
    is what SQL gives every non-COUNT aggregate and every grouping key
    over empty input.
    """
    fallback_cols = []
    for f in grouped.schema.fields:
        v = values.get(f.name)
        col = v if isinstance(v, Column) else F.lit(v)  # lit(None) -> NULL
        fallback_cols.append(col.cast(f.dataType).alias(f.name))
    probe = source.limit(1).select(F.lit(1).alias(_PROBE))
    spark = grouped.sparkSession
    fallback = (
        spark.range(1)
        .select(F.lit(1).alias(_PROBE), *fallback_cols)
        .join(F.broadcast(probe), _PROBE, "left_anti")
        .select(*[f.name for f in grouped.schema.fields])
    )
    return grouped.unionByName(fallback)
