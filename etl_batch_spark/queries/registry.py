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
    # Optional alternate builder for bench.py when the correctness form
    # deliberately does extra verification work (e.g. q78 runs the exact
    # semi join to strip bloom false positives for the oracle, while the
    # plan the operator exists to produce is the join-free probe).
    bench_build: Builder | None = None


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    *,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    bench_build: Builder | None = None,
):
    """Decorator: register a Spark query builder with its DuckDB oracle."""

    def wrap(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name,
            build=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            bench=bench,
            bench_build=bench_build,
        )
        return fn

    return wrap
