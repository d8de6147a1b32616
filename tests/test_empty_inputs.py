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
