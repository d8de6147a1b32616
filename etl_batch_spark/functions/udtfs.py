"""Python UDTFs — the table-function surface.

The reference parses delimited fields row-at-a-time with
``func_get_nth_field`` / ``func_field_counter`` (pkg_batch_util_body.sql:
729–814): callers loop positions to unpack a record.  The engine's
table-function form expands the whole record in one lateral pass —
``SELECT ... FROM t, LATERAL split_fields(t.col, ',')`` — and the loop
disappears into the plan.

UDTFs are the Python-row path (each ``eval`` yields tuples), so they
belong to glue-level cardinality (unpacking config/loader records), not
100 TB fact columns — there, use ``posexplode(split(...))`` which stays
in codegen (q81).  The parity point is API completeness plus the
reference's field semantics: 1-based positions, empty fields preserved,
NULL input yields no rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, field string")
class SplitFieldsUDTF:
    """Expand ``s`` into (pos, field) rows, 1-based, keeping empties."""

    def eval(self, s: str, delim: str):  # noqa: D102
        if s is None:
            return
        for i, f in enumerate(s.split(delim or ","), start=1):
            yield i, f


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the engine's UDTFs on this session; returns their names."""
    spark.udtf.register("split_fields", SplitFieldsUDTF)
    return ["split_fields"]
