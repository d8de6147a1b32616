"""CLI surface: `python -m etl_batch_spark` list / run / sql."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_batch_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from etl_batch_spark.queries import QUERIES

    for name in QUERIES:
        assert name in out


def test_run_wraps_query_in_lifecycle(spark, capsys):
    assert main(["run", "q01_pricing_summary", "--sf-dir", SF]) == 0
    out = capsys.readouterr().out
    assert "status=SUCCESS" in out
    assert "processed=6" in out
    assert "q01_pricing_summary: 6 rows" in out


def test_run_unknown_query_exits_2(capsys):
    assert main(["run", "nope_not_real"]) == 2


def test_sql_over_views(spark, capsys):
    assert (
        main(["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", SF, "--out", "noop"])
        == 0
    )
    assert "sql: 1 rows" in capsys.readouterr().out


def test_explain_prints_formatted_plan(spark, capsys):
    assert main(["explain", "q01_pricing_summary", "--sf-dir", SF]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
