"""Distribution-drift detection between two dataset slices.

The training-data monitoring primitive: before a new crawl/date-range
joins the corpus (or a model retrains), compare its feature
distributions against the reference window.  PSI (population stability
index) is the standard score — ``Σ (q_i − p_i) · ln(q_i / p_i)`` over
bucket shares, with the usual reading: < 0.1 stable, 0.1–0.25 drifting,
> 0.25 shifted.

Determinism: bucket counts are exact integers, shares are Laplace-
smoothed ``(c + 1) / (N + K)`` — identical divisions in any engine, and
add-one smoothing makes buckets absent from one side well-defined
instead of a ln(0).  The final sum is rounded to 4dp (the
token-entropy discipline for ln-carrying outputs).

Scale shape: each side reduces to (bucket, count) partials — one
partial-aggregated shuffle each, merged with a full-outer equi-join on
the bucket; the PSI fold runs over the bucket table (bounded by bucket
cardinality, never rows).  Numeric columns bucket via the same
``floor(value / width)`` binning the histogram sketch uses
(operators/sketch.py), so drift can also be scored from STORED
day-partials without touching raw history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi(
    ref: DataFrame,
    cur: DataFrame,
    *,
    bucket_col: str,
    round_to: int = 4,
) -> DataFrame:
    """1-row ``(psi, n_ref, n_cur, n_buckets)`` between two slices.

    ``bucket_col`` is any categorical column (pre-bin numeric columns
    with ``floor(col / width)``).
    """
    rc = ref.groupBy(F.col(bucket_col).alias("b")).agg(
        F.count(F.lit(1)).alias("c_ref")
    )
    cc = cur.groupBy(F.col(bucket_col).alias("b")).agg(
        F.count(F.lit(1)).alias("c_cur")
    )
    both = (
        rc.join(cc, "b", "full_outer")
        .select(
            "b",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    tot = both.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("k"),
    )
    shares = both.crossJoin(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        "k",
        ((F.col("c_ref") + 1) / (F.col("n_ref") + F.col("k"))).alias("p"),
        ((F.col("c_cur") + 1) / (F.col("n_cur") + F.col("k"))).alias("q"),
    )
    return shares.groupBy("n_ref", "n_cur", F.col("k").alias("n_buckets")).agg(
        F.round(
            F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))), round_to
        ).alias("psi")
    ).select("psi", "n_ref", "n_cur", "n_buckets")
