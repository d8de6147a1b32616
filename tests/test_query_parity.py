"""The t2-style correctness gate, run locally at sf0.001: every registered
query's Spark result must match its DuckDB oracle (order-insensitive,
column-name-keyed, floats to 1e-9)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_batch_spark.catalog import DATA_TABLES, table_path
from etl_batch_spark.queries import QUERIES
from tools.parity import compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in DATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF, name)}')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.build(spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only check (non-SQL-expressible operator)
        assert spark_rows is not None
        return
    res = duck.execute(q.oracle)
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()
    errs, bit_exact = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    assert not errs, f"{name}: {errs[:5]}"
    # the driver hashes exactly — tolerance-only passes are latent failures
    assert bit_exact, f"{name}: floats differ below 1e-9 (driver hash risk)"
