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

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Fixtures have shipped events.ts as both TIMESTAMP(MICROS) and
# TIMESTAMP(NANOS) (TESTDATA.md); the Spark side normalizes to micros in
# catalog.load_table, so every oracle must read micros too or its
# ts-derived values carry three extra digits the Spark result lost.
# Rewriting each oracle to read events through a micros-pinning CTE
# (CAST(ts AS TIMESTAMP) is a no-op on micros fixtures, a truncation on
# nanos ones) keeps the whole registry fixture-proof in ONE place.
_EVENTS_CTE = (
    "events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"
)


def _pin_events_micros(oracle: str | None) -> str | None:
    if oracle is None or not re.search(r"\bevents\b", oracle):
        return oracle
    body = re.sub(r"\bevents\b", "events_us", oracle)
    stripped = body.lstrip()
    lead = body[: len(body) - len(stripped)]
    m = re.match(r"WITH\s+RECURSIVE\s+", stripped, flags=re.IGNORECASE)
    if m:
        return f"{lead}WITH RECURSIVE {_EVENTS_CTE},\n    {stripped[m.end():]}"
    m = re.match(r"WITH\s+", stripped, flags=re.IGNORECASE)
    if m:
        return f"{lead}WITH {_EVENTS_CTE},\n    {stripped[m.end():]}"
    return f"{lead}WITH {_EVENTS_CTE}\n    {stripped}"


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
            oracle=_pin_events_micros(oracle),
            doc=doc or (fn.__doc__ or ""),
            bench=bench,
            bench_build=bench_build,
        )
        return fn

    return wrap
