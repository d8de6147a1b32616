"""Stock-session conformance: the driver contract hands ``entry(spark)``
a SparkSession the engine did NOT build, so any operator whose behavior
depends on a ``session.py`` conf silently changes there.  Round 9's one
red driver row (et42) was exactly this class of bug: data skipping
worked under ``get_spark()`` (TIMESTAMP_MICROS pinned) and evaporated
under the driver's stock session (INT96 → no parquet stats).

This test runs the conf-sensitive queries in a SUBPROCESS under a plain
``SparkSession.builder.getOrCreate()`` — no factory confs — which is
the driver's actual surface:

- et42_data_skipping: parquet timestamp stats (its in-query gate
  asserts files were pruned, so a pass IS the proof);
- ss13_multitable_ann / ss10_pq_ann: ANSI array-index semantics
  (Spark 4 defaults ANSI on; this pins the assumption);
- q05_date_trunc_daily: session timezone sensitivity;
- et27_cusum_changepoints: Arrow-path execution.

For the value-bearing queries the subprocess prints row count + an
order-insensitive value hash, compared here against the engine-session
result — same rows under either session, not merely "it ran".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

CHECK_QUERIES = [
    "et42_data_skipping",
    "ss13_multitable_ann",
    "ss10_pq_ann",
    "q05_date_trunc_daily",
    "et27_cusum_changepoints",
]

_SUBPROC_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, {repo!r})
from etl_batch_spark.queries import QUERIES

# the driver's surface: a session with NO engine confs
spark = SparkSession.builder.master("local[4]").appName("stock").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96", (
    "precondition lost: stock PySpark no longer defaults to INT96 — "
    "this test's et42 scenario needs re-deriving"
)

out = {{}}
for name in {names!r}:
    df = QUERIES[name].build(spark, {sf!r})
    digest = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h"),
    ).collect()[0]
    out[name] = [digest["n"], digest["h"]]
print("RESULT:" + json.dumps(out))
"""


@pytest.fixture(scope="module")
def stock_results() -> dict:
    script = _SUBPROC_SCRIPT.format(repo=REPO, names=CHECK_QUERIES, sf=SF)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"stock-session run failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}"
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in stock-session output: {proc.stdout[-500:]}"
    return json.loads(line[-1][len("RESULT:"):])


@pytest.mark.parametrize("name", CHECK_QUERIES)
def test_stock_session_matches_engine_session(spark, name, stock_results):
    from pyspark.sql import functions as F

    from etl_batch_spark.queries import QUERIES

    df = QUERIES[name].build(spark, SF)
    digest = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h"),
    ).collect()[0]
    assert [digest["n"], digest["h"]] == stock_results[name], (
        f"{name} diverges between the engine session and a stock "
        "session — a session-conf dependence leaked into the operator"
    )
