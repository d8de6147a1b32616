"""Oracle dialect shim: the reference's embedded SQL idioms must run
verbatim (after translation) against control-table views.

Statement shapes mirror pkg_batch_util_body.sql: the batch_master point
lookup (133–143), NVL(MAX(run_id),0)+1 allocation (175–181), DECODE
status matrix (271–279), parameter-prefix INSTR/SUBSTR match (283–322),
TO_DATE/TO_CHAR round trips (115–116, 947–948), ROWNUM guards (164,
322, 930).
"""

from __future__ import annotations

import pytest

from etl_batch_spark.functions.oracle_sql import (
    run_oracle_sql,
    translate,
    translate_format,
)


@pytest.fixture(scope="module")
def control_views(spark):
    spark.createDataFrame(
        [
            (1, "DAILY000", 1, None),
            (2, "LOAD_CUST", 1, None),
            (3, "LOAD_CUST", 2, None),
        ],
        "module_id long, module_name string, run_level long, disabled_date timestamp",
    ).createOrReplaceTempView("batch_master")
    spark.createDataFrame(
        [
            (1, 1, "SUCCESS", "2026-08-12 01:00:00", "p1 Run_level=<1>"),
            (1, 2, "RUNNING", "2026-08-12 02:00:00", "p1 Run_level=<1>"),
            (2, 1, "WAITING", "2026-08-12 03:00:00", "x Run_level=<2>"),
        ],
        "module_id long, run_id long, run_status string, run_date_s string, parameters string",
    ).createOrReplaceTempView("batch_monitor_raw")
    spark.sql(
        "SELECT module_id, run_id, run_status, parameters, "
        "CAST(run_date_s AS TIMESTAMP) AS run_date FROM batch_monitor_raw"
    ).createOrReplaceTempView("batch_monitor")
    return spark


class TestFormatTranslation:
    def test_reference_formats(self):
        assert translate_format("DD-MON-YYYY") == "dd-MMM-yyyy"
        assert translate_format("YYYY/MM/DD HH24:MI:SS") == "yyyy/MM/dd HH:mm:ss"
        assert translate_format("DD-MON-YYYY HH24:MI") == "dd-MMM-yyyy HH:mm"


class TestTranslate:
    def test_sysdate_and_trunc(self):
        out = translate("SELECT 1 FROM t WHERE TRUNC(run_date) = TRUNC(SYSDATE)")
        assert "date_trunc('DAY', run_date)" in out
        assert "date_trunc('DAY', current_timestamp())" in out
        assert "SYSDATE" not in out

    def test_two_arg_trunc_passes_through(self):
        assert "trunc(d, 'MM')" in translate("SELECT TRUNC(d, 'MM') FROM t")

    def test_rownum_tail_becomes_limit(self):
        out = translate("SELECT module_id FROM batch_monitor WHERE ROWNUM < 2")
        assert out.rstrip().endswith("LIMIT 1") and "ROWNUM" not in out
        out2 = translate("SELECT 1 FROM t WHERE a = 1 AND ROWNUM = 1")
        assert out2.rstrip().endswith("LIMIT 1") and "ROWNUM" not in out2

    def test_unknown_statements_pass_through(self):
        sql = "SELECT NVL(a, b), DECODE(c, 1, 'x', 'y') FROM t"
        assert translate(sql) == sql


class TestReferenceStatements:
    def test_point_lookup(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT module_id FROM batch_master "
            "WHERE UPPER(module_name) = UPPER('load_cust') AND run_level = 2",
        )
        assert [r.module_id for r in df.collect()] == [3]

    def test_next_run_id_nvl_max(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT NVL(MAX(run_id), 0) + 1 AS next_id FROM batch_monitor "
            "WHERE module_id = 1 "
            "AND TRUNC(run_date) = TRUNC(TO_DATE('12-AUG-2026', 'DD-MON-YYYY'))",
        )
        assert df.first()["next_id"] == 3
        empty = run_oracle_sql(
            control_views,
            "SELECT NVL(MAX(run_id), 0) + 1 AS next_id FROM batch_monitor "
            "WHERE module_id = 99",
        )
        assert empty.first()["next_id"] == 1

    def test_decode_status_matrix(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT run_id, DECODE(run_status, 'SUCCESS', 0, "
            "'RUNNING', 1, 'WAITING', 1, 2) AS code "
            "FROM batch_monitor WHERE module_id = 1 ORDER BY run_id",
        )
        assert [(r.run_id, r.code) for r in df.collect()] == [(1, 0), (2, 1)]

    def test_parameter_prefix_match(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT run_id FROM batch_monitor "
            "WHERE UPPER(SUBSTR(parameters, 1, INSTR(parameters, 'Run_level=<') - 2)) "
            "= UPPER('p1') ORDER BY run_id",
        )
        assert [r.run_id for r in df.collect()] == [1, 2]

    def test_to_date_case_insensitive_month(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT TO_CHAR(TO_DATE('13-aug-2026', 'DD-MON-YYYY'), "
            "'YYYY/MM/DD HH24:MI:SS') AS s",
        )
        assert df.first()["s"] == "2026/08/13 00:00:00"

    def test_rownum_with_order_by_applies_intent(self, control_views):
        # SURVEY §2.A11: the reference's ROWNUM-before-ORDER-BY quirk is
        # translated to the evident intent (latest first, then limit)
        df = run_oracle_sql(
            control_views,
            "SELECT run_id FROM batch_monitor "
            "WHERE module_id = 1 AND ROWNUM < 2 ORDER BY run_date DESC",
        )
        assert [r.run_id for r in df.collect()] == [2]

    def test_union_all_ordered(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT run_id FROM batch_monitor WHERE run_status = 'RUNNING' "
            "UNION ALL "
            "SELECT run_id FROM batch_monitor WHERE run_status = 'WAITING' "
            "ORDER BY run_id",
        )
        assert [r.run_id for r in df.collect()] == [1, 2]

    def test_concat_pipes(self, control_views):
        df = run_oracle_sql(
            control_views,
            "SELECT module_name || ' Run_level=<' || run_level || '>' AS p "
            "FROM batch_master WHERE module_id = 1",
        )
        assert df.first()["p"] == "DAILY000 Run_level=<1>"
