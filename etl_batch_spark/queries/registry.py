"""Registry of oracle-checked queries.

Each :class:`Query` couples a Spark builder ``(spark, sf_dir) -> DataFrame``
with the equivalent DuckDB SQL (the correctness oracle).  Column names MUST
match between the two — the driver's comparator sorts columns by name
before hashing values.

``oracle=None`` marks genuinely non-SQL-expressible operators (custom
stateful streaming, iterative algorithms); the driver then records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None
    doc: str = ""
    bench: bool = False  # part of the headline bench set (bench.py)


QUERIES: dict[str, Query] = {}


def query(name: str, *, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator: register a Spark query builder with its DuckDB oracle."""

    def wrap(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), bench=bench)
        return fn

    return wrap
