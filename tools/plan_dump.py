"""Dump .explain('formatted') for every benched query to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where <suffix> is the second
half of the tag convention (e.g. tag ``r10_before`` →
``plans/r10/<query>_before.txt``).  The judge reads these files to
check plan claims (Exchange counts, join strategies, PushedFilters),
so they are captured from the exact build the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_batch_spark.plans import formatted_plan
from etl_batch_spark.queries import QUERIES
from etl_batch_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10_before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or [n for n, q in QUERIES.items() if q.bench]
    round_dir, _, suffix = tag.partition("_")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = QUERIES[name]
        build = q.bench_build or q.build
        try:
            plan = formatted_plan(build(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"PLAN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix or 'plan'}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
