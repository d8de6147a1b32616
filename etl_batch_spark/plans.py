"""Physical-plan inspection utilities.

The engine's performance contract is enforced, not hoped for: tests
assert that filters reach the parquet scan, that bounded dimensions
broadcast, and that scans are column-pruned (SURVEY.md §4's "everything
at this layer is stock Catalyst" — these helpers prove each query uses
it).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def count_ops(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'Exchange', 'SortMergeJoin') in the formatted plan's tree section."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]  # numbered-detail section repeats op names
    return len(re.findall(rf"\b{re.escape(op)}\b", tree))


def unpartitioned_windows(df: DataFrame) -> int:
    """Count Window physical ops with NO partition spec (the
    `WindowExec: No Partition Defined` single-task shape).

    A partitioned+ordered ``Window`` detail line carries three top-level
    bracket groups ([exprs], [partition], [order]); two groups mean either
    unpartitioned ([exprs], [order]) or partition-only ([exprs],
    [partition]) — told apart by the sort direction (ASC/DESC) an order
    spec always prints and a partition list never does.
    ``WindowGroupLimit`` argument lines are ([partition], [order], fn, k,
    mode) — for those only an EMPTY first group means unpartitioned."""
    plan = formatted_plan(df)
    n = 0
    for m in re.finditer(
        r"\(\d+\) (Window(?:GroupLimit)?)\n((?:.+\n)*?)\n", plan + "\n"
    ):
        op = m.group(1)
        for line in m.group(2).splitlines():
            if not line.startswith("Arguments:"):
                continue
            groups: list[str] = []
            depth, start = 0, -1
            for i, ch in enumerate(line):
                if ch == "[":
                    if depth == 0:
                        start = i
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append(line[start : i + 1])
            ordered = lambda g: " ASC" in g or " DESC" in g  # noqa: E731
            if op == "Window" and len(groups) == 2 and ordered(groups[1]):
                n += 1
            elif op == "WindowGroupLimit" and groups and groups[0] == "[]":
                n += 1
    return n


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    filters = pushed_filters(df)
    if not any(column in f for f in filters):
        raise AssertionError(f"no pushed filter on {column!r}; pushed: {filters}")


def assert_broadcast(df: DataFrame, at_least: int = 1) -> None:
    n = count_ops(df, "BroadcastHashJoin") + count_ops(df, "BroadcastNestedLoopJoin")
    if n < at_least:
        raise AssertionError(f"expected ≥{at_least} broadcast joins, plan has {n}")


def assert_columns_pruned(df: DataFrame, table_width: int) -> None:
    """Assert no scan reads all ``table_width`` columns (pruning active)."""
    for cols in read_schemas(df):
        if len(cols) >= table_width:
            raise AssertionError(f"scan reads {len(cols)} columns — pruning lost: {cols}")
