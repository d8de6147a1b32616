"""Extra query-surface tests: approximate aggregates vs exact answers,
and registry hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_batch_spark.catalog import load_table
from etl_batch_spark.queries import QUERIES


def test_approx_aggregates_close_to_exact(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r for r in QUERIES["q38_approx_aggregates"].build(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_orders"] - e["orders"]) <= 0.1 * e["orders"]
        assert abs(a["approx_parts"] - e["parts"]) <= 0.1 * e["parts"]
        assert abs(a["approx_median_price"] - e["median"]) <= 0.15 * e["median"]


def test_registry_names_unique_and_documented():
    assert len(QUERIES) >= 45
    for name, q in QUERIES.items():
        assert q.build is not None
        assert q.doc or q.oracle, f"{name} lacks documentation"


def test_every_bench_query_has_oracle_or_reason():
    for name, q in QUERIES.items():
        if q.bench:
            assert q.oracle is not None, f"bench query {name} must be oracle-checked"


def test_et12_fifo_conserves_quantity(spark, sf_dir):
    """FIFO matching must fully cover every demand line: per demand
    line, allocations sum to exactly its quantity (supply == demand by
    construction, so nothing is left over on either queue)."""
    df = QUERIES["et12_fifo_allocation"].build(spark, sf_dir)
    from etl_batch_spark.catalog import load_table

    per_demand = df.groupBy("partkey", "d_orderkey", "d_linenumber").agg(
        F.round(F.sum("allocated"), 2).alias("got")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 50 == 0)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_orderkey").alias("d_orderkey"),
            F.col("l_linenumber").alias("d_linenumber"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("want"))
    )
    bad = (
        per_demand.join(li, ["partkey", "d_orderkey", "d_linenumber"], "full_outer")
        .filter((F.col("got").isNull()) | (F.col("want").isNull()) | (F.col("got") != F.col("want")))
        .count()
    )
    assert bad == 0
