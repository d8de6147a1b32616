"""General as-of join — pandas ``merge_asof`` semantics on Spark, at
shuffle-linear cost.

``asof_join(left, right, on=ts, by=keys)`` matches each left row to the
nearest right row per key: ``backward`` (latest right ≤ left, the quote
lookup), ``forward`` (earliest right ≥ left), or ``nearest``; an
optional ``tolerance_s`` (seconds) discards matches farther than the
bound.  ``allow_exact_matches=False`` makes the comparison strict.

Shape: union both inputs tagged by side, then windows over (keys, time)
— a single shuffle regardless of direction (``nearest`` adds a second
sort on the same exchange, not a second shuffle), never an inequality
join (which Catalyst can only plan as a nested loop and which explodes
on dense keys).  This is the q22 formulation promoted to an operator:
any (fact, slowly-ticking reference) pair — trades×quotes,
events×deploys, orders×price-lists — joins at the cost of sorts within
each key partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
    right_value_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left rows + matched right value columns (null when no match).

    ``on`` must be a timestamp column present on both sides; ``by`` the
    equality keys.  ``right_value_cols`` defaults to every right column
    except ``on``/``by``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    # `is not None`, not truthiness: an explicit [] means "no value
    # columns, existence only" and must not fall back to every column
    src = right.columns if right_value_cols is None else right_value_cols
    vals = [c for c in src if c not in {on, *by}]

    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in vals],
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # exact matches are an ORDERING question, not a frame question: with
    # right rows (side 0) sorted before coincident left rows, an equal-ts
    # right row falls inside the up-to-current frame (inclusive match);
    # sorting left rows first pushes equal-ts right rows past the frame
    # (strict match).  A -1 frame end would only skip one row, not every
    # coincident one.
    tie = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()

    def matched(dirn: str, col: Column) -> Column:
        # forward direction flips the time axis and reuses the same frame
        t = F.col(on) if dirn == "backward" else -F.unix_micros(F.col(on))
        w = (
            W.partitionBy(*by)
            .orderBy(t, tie)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return F.last(F.when(F.col("_side") == 0, col), ignorenulls=True).over(w)

    dirs = ("backward", "forward") if direction == "nearest" else (direction,)
    out = u
    for d in dirs:
        out = out.withColumn(f"_m_{d}_{on}", matched(d, F.col(on)))
        for c in vals:
            out = out.withColumn(f"_m_{d}_{c}", matched(d, F.col(f"_rv_{c}")))
    out = out.filter(F.col("_side") == 1).drop("_side", *[f"_rv_{c}" for c in vals])

    if direction == "nearest":
        bgap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"_m_backward_{on}")))
        fgap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"_m_forward_{on}")))
        out = out.withColumn(
            "_use_fwd",
            F.col(f"_m_backward_{on}").isNull()
            | (F.col(f"_m_forward_{on}").isNotNull() & (fgap < bgap)),
        )
        for c in [on, *vals]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(F.col("_use_fwd"), F.col(f"_m_forward_{c}")).otherwise(
                    F.col(f"_m_backward_{c}")
                ),
            ).drop(f"_m_backward_{c}", f"_m_forward_{c}")
        out = out.drop("_use_fwd")
    else:
        d = dirs[0]
        for c in [on, *vals]:
            out = out.withColumnRenamed(f"_m_{d}_{c}", f"{c}{suffix}")

    if tolerance_s is not None:
        gap = (
            F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"{on}{suffix}")))
            / 1e6
        )
        keep = F.col(f"{on}{suffix}").isNotNull() & (gap <= tolerance_s)
        for c in [on, *vals]:
            out = out.withColumn(
                f"{c}{suffix}", F.when(keep, F.col(f"{c}{suffix}"))
            )
    return out
