"""Oracle-checked queries exercising the reference's scalar utilities
(SURVEY.md §2.B) as data-plane column expressions.

Every builder uses the native-expression forms from
``etl_batch_spark.functions.scalars`` — no Python UDFs — so the scalar
surface rides whole-stage codegen at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_batch_spark.catalog import load_table
from etl_batch_spark.functions.scalars import (
    datediff_hms_col,
    field_counter_col,
    nth_field_col,
    string_to_number_col,
)
from etl_batch_spark.queries.registry import query


# ---------------------------------------------------------------------------
# func_field_counter (B3, body.sql:729-762): delimiter-count formula
# len(s) - len(replace(s, d)) (+1 unterminated) over part names.
# ---------------------------------------------------------------------------
@query(
    "q30_field_counter",
    oracle="""
    SELECT CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS INT) AS n_fields,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY 1
    """,
)
def q30_field_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(field_counter_col(F.col("p_name"), unterminated=True, delim=" ").alias("n_fields"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# func_get_nth_field (B4, body.sql:768-814): 1-based nth delimited field.
# ---------------------------------------------------------------------------
@query(
    "q31_nth_field",
    oracle="""
    SELECT CASE WHEN LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 >= 2
                THEN SPLIT_PART(p_name, ' ', 2) END AS second_word,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY 1
    """,
)
def q31_nth_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(nth_field_col(F.col("p_name"), 2, delim=" ").alias("second_word"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# func_string_to_number / func_atol (B5/B6, body.sql:817-857): digits-only
# atoi over order priorities ('1-URGENT' -> 1); no sign, no-match -> 0.
# ---------------------------------------------------------------------------
@query(
    "q32_atoi_priority",
    oracle="""
    SELECT CAST(COALESCE(NULLIF(regexp_extract(TRIM(o_orderpriority), '^([0-9]+)', 1), ''),
                         '0') AS BIGINT) AS urgency,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q32_atoi_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(string_to_number_col(F.col("o_orderpriority")).alias("urgency"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# func_datediff (B1, body.sql:17-36): unpadded 'H:M:S' elapsed string
# between order date and last shipment of the order.
# ---------------------------------------------------------------------------
@query(
    "q33_datediff_hms",
    oracle="""
    SELECT o_orderkey,
           (CAST(d // 3600 AS VARCHAR) || ':' ||
            CAST((d % 3600) // 60 AS VARCHAR) || ':' ||
            CAST(d % 60 AS VARCHAR)) AS elapsed_hms
    FROM (
      SELECT o.o_orderkey,
             date_diff('second', o.o_orderdate, MAX(l.l_shipdate)) AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    )
    WHERE d >= 0
    """,
)
def q33_datediff_hms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one output row per DISTINCT order: the oracle's GROUP BY
    # (o_orderkey, o_orderdate) collapses duplicate order rows, so the
    # Spark grain is pinned with the same distinct before the join
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .distinct()
    )
    li = load_table(spark, sf_dir, "lineitem")
    last_ship = (
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_shipdate"))
    )
    j = o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
    elapsed = datediff_hms_col(F.col("o_orderdate"), F.col("last_shipdate"))
    return (
        j.filter(F.col("last_shipdate") >= F.col("o_orderdate"))
        .select("o_orderkey", elapsed.alias("elapsed_hms"))
    )


# ---------------------------------------------------------------------------
# func_check_date (B2, body.sql:90-123): DD-MON-YYYY validation status
# codes (-1 short / 1 long / 2 unparseable / 0 ok) over mixed inputs:
# real date strings (valid) and priority strings (invalid lengths).
# ---------------------------------------------------------------------------
@query(
    "q34_check_date_codes",
    oracle="""
    WITH inputs AS (
      SELECT strftime(o_orderdate, '%d-%b-%Y') AS s FROM orders
      UNION ALL
      SELECT o_orderpriority AS s FROM orders
    )
    SELECT CASE WHEN s IS NULL OR LENGTH(s) < 10 THEN -1
                WHEN LENGTH(s) > 11 THEN 1
                WHEN try_strptime(s, '%d-%b-%Y') IS NULL THEN 2
                ELSE 0 END AS status_code,
           COUNT(*) AS n_inputs
    FROM inputs
    GROUP BY 1
    """,
)
def q34_check_date_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dates = o.select(F.date_format("o_orderdate", "dd-MMM-yyyy").alias("s"))
    prios = o.select(F.col("o_orderpriority").alias("s"))
    inputs = dates.unionAll(prios)
    canon = F.try_to_date(F.initcap(F.lower(F.col("s"))), "dd-MMM-yyyy")
    status = (
        F.when(F.col("s").isNull() | (F.length("s") < 10), -1)
        .when(F.length("s") > 11, 1)
        .when(canon.isNull(), 2)
        .otherwise(0)
    )
    return inputs.groupBy(status.alias("status_code")).agg(F.count(F.lit(1)).alias("n_inputs"))
