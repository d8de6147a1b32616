"""Zero-row robustness: every registered query must BUILD and EXECUTE
against empty (but correctly-typed) fixture tables without raising.

A 100 TB pipeline routinely meets empty slices — a new partition before
data lands, a filter that matches nothing, a backfill over a quiet day.
An operator that throws on empty input (divide-by-zero on an empty
aggregate, ``first()`` on no rows, a seed pick from an empty corpus)
fails the whole job, so emptiness is part of each operator's contract.

Queries whose SEMANTICS require a non-empty corpus (model/index builds
that seed from data) belong in ``NEEDS_DATA`` with the reason — the
list is the documented surface of that contract, and additions to it
should be deliberate.
"""

from __future__ import annotations

import pytest

from etl_batch_spark.catalog import DATA_TABLES, table_path
from etl_batch_spark.queries import QUERIES

# Queries that are DEFINED over a non-empty corpus: they collect a
# bounded seed/model from the data itself (documented in each operator).
NEEDS_DATA: dict[str, str] = {}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    base = tmp_path_factory.mktemp("sf_empty")
    for name, schema in DATA_TABLES.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            table_path(str(base), name)
        )
    return str(base)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    if name in NEEDS_DATA:
        pytest.skip(f"requires data by contract: {NEEDS_DATA[name]}")
    df = QUERIES[name].build(spark, empty_sf_dir)
    df.write.format("noop").mode("overwrite").save()


class TestEnsureGrandRow:
    """SQL-standard () grand-total row over empty input
    (operators/grouping.py): DuckDB/Postgres emit one row for any
    grouping-set list containing (), Spark emits zero — the operator
    restores the standard without disturbing non-empty results."""

    def _frames(self, spark, rows):
        from etl_batch_spark.operators.grouping import ensure_grand_row
        from pyspark.sql import functions as F

        src = spark.createDataFrame(rows, "a string, b string, v double")
        rolled = src.rollup("a", "b").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("total")
        )
        return src, rolled, ensure_grand_row(rolled, src, {"n": 0})

    def test_empty_source_emits_sql_grand_row(self, spark):
        _, _, fixed = self._frames(spark, [])
        rows = fixed.collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.a, r.b, r.n, r.total) == (None, None, 0, None)

    def test_nonempty_source_is_untouched(self, spark):
        _, rolled, fixed = self._frames(
            spark, [("x", "y", 1.0), ("x", "z", 2.0), (None, "w", 4.0)]
        )
        key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
        want = sorted(map(tuple, rolled.collect()), key=key)
        got = sorted(map(tuple, fixed.collect()), key=key)
        assert got == want  # incl. the data-NULL group staying distinct

    def test_probe_is_limit_one(self, spark):
        # the emptiness probe must be a LIMIT 1 over the SOURCE — never
        # a second aggregation — so non-empty data pays one split read
        _, _, fixed = self._frames(spark, [("x", "y", 1.0)])
        plan = fixed._jdf.queryExecution().optimizedPlan().toString()
        assert "GlobalLimit 1" in plan


def test_q16_rollup_empty_input_has_grand_row(spark, empty_sf_dir):
    rows = QUERIES["q16_rollup"].build(spark, empty_sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_customers == 0 and rows[0].total_balance is None


def test_q40_grouping_sets_empty_input_has_grand_row(spark, empty_sf_dir):
    rows = QUERIES["q40_grouping_sets"].build(spark, empty_sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.returnflag, r.linestatus, r.gid, r.n_rows) == ("ALL", "ALL", 3, 0)
