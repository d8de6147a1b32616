"""Derive a perturbed subset of a fixture dir for generalization parity.

The driver verifies at exactly sf0.01, so a query whose Spark and
DuckDB forms agree there could still hide a DATA-DEPENDENT divergence —
a tie-break that never ties on that data, an empty-group path never
taken, a boundary a filter never lands on.  This tool derives a
deterministic row-subset of any fixture dir; running the full
``tools/parity.py`` gate over a few seeds exercises every registered
query on data it was never tuned against:

    python tools/gen_subset.py --seed 1
    python tools/parity.py /root/repo/.benchdata/subset/s1

Sampling is per-row on a hash of (primary key, seed), so it is
deterministic, seed-varied, and REFERENTIALLY RAGGED on purpose:
dropping an order while keeping its lineitems (and vice versa) creates
dangling keys, emptier join groups and removed ties — exactly the
edge-case distribution shift wanted.  Both engines read the same
written parquet, so parity semantics are unchanged.  ``region`` and
``nation`` stay full (5/25-row constant dimensions).

Pure DuckDB, no Spark.  Same layout contract as tools/gen_sf.py.
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> non-key VALUE columns eligible for --nulls injection.  Keys /
# ids stay non-null: their non-null contract is legitimate (the driver
# fixtures guarantee it, and operator-level NULL-key hardening has its
# own tests) — the sweep targets the value/ordering columns where Spark
# and DuckDB NULL semantics (ordering, aggregates, arithmetic) can
# silently diverge.
NULLABLE_COLUMNS = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_brand"],
    "orders": ["o_totalprice", "o_orderpriority", "o_orderstatus"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount",
                 "l_shipdate", "l_returnflag"],
    "events": ["value", "props", "ts"],
    "documents": ["lang", "source", "text"],
    "embeddings": ["label"],
}

# table -> primary-key column list (hash input for the keep decision)
PRIMARY_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FULL_TABLES = ["region", "nation"]


def main(argv: "list[str] | None" = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--keep", type=int, default=80, help="percent of rows kept")
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="default .benchdata/subset/s<seed>")
    ap.add_argument(
        "--nulls", type=int, default=0,
        help="percent of rows whose NULLABLE_COLUMNS entries are nulled "
             "(per column, independent hash draws)",
    )
    args = ap.parse_args(argv)
    out = args.out or f"/root/repo/.benchdata/subset/s{args.seed}"
    if not 0 < args.keep <= 100:
        raise SystemExit(f"--keep must be in (0, 100], got {args.keep}")
    if not 0 <= args.nulls <= 100:
        raise SystemExit(f"--nulls must be in [0, 100], got {args.nulls}")
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    for t in FULL_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied full")
    for t, pk in PRIMARY_KEYS.items():
        key = " || ':' || ".join(f"CAST({c} AS VARCHAR)" for c in pk)
        proj = "*"
        if args.nulls:
            cols = [
                r[0] for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
                ).fetchall()
            ]
            exprs = []
            for c in cols:
                if c in NULLABLE_COLUMNS.get(t, []):
                    exprs.append(
                        f"CASE WHEN hash({key} || '|{c}#{args.seed}') % 100 "
                        f"< {args.nulls} THEN NULL ELSE {c} END AS {c}"
                    )
                else:
                    exprs.append(c)
            proj = ", ".join(exprs)
        con.execute(
            f"COPY (SELECT {proj} FROM '{args.src}/{t}.parquet' "
            f"      WHERE hash({key} || '#{args.seed}') % 100 < {args.keep}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n_src = con.execute(f"SELECT count(*) FROM '{args.src}/{t}.parquet'").fetchone()[0]
        n_out = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n_src} -> {n_out} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
