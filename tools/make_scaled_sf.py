"""Generate an R×-replicated copy of a driver sf directory for scale runs.

Fact tables are replicated R times with replica-consistent key offsets
(orderkey/custkey/partkey/suppkey/doc_id/vec_id/event_id/user_id shift
together, so every join keeps its selectivity); dimension tables
(region, nation) keep their fixed cardinality, exactly like a real
scale-factor bump. Row payloads are byte-identical across replicas, so a
suite comparison against the base sf isolates ENGINE scaling: per-row
work is constant, only volume grows.

Usage: python tools/make_scaled_sf.py --src /root/testdata/sf0.1 \
           --dst /tmp/kwage_sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os

import duckdb

# per-table: columns shifted by replica * (1 + global max of that key
# family), keyed by family name so cross-table joins stay aligned
KEY_FAMILIES = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}
DIM_TABLES = ("region", "nation")
FACT_TABLES = ("customer", "supplier", "part", "orders", "lineitem",
               "events", "documents", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()

    # one offset base per key family = 1 + max over every column in it
    base: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        m = 0
        for tbl, col in cols:
            m = max(m, con.execute(
                f"SELECT max({col}) FROM '{args.src}/{tbl}.parquet'"
            ).fetchone()[0] or 0)
        base[fam] = int(m) + 1

    shifted = {}  # (table, col) -> offset base
    for fam, cols in KEY_FAMILIES.items():
        for tbl, col in cols:
            shifted[(tbl, col)] = base[fam]

    for tbl in DIM_TABLES:
        con.execute(f"COPY (SELECT * FROM '{args.src}/{tbl}.parquet') TO "
                    f"'{args.dst}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"{tbl}: copied (dimension)")

    for tbl in FACT_TABLES:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{args.src}/{tbl}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.i * {shifted[(tbl, c)]} AS {c}"
            if (tbl, c) in shifted else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{args.src}/{tbl}.parquet' CROSS JOIN "
            f"(SELECT unnest(generate_series(0, {args.factor - 1})) AS i) r) "
            f"TO '{args.dst}/{tbl}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: x{args.factor} -> {n} rows")


if __name__ == "__main__":
    main()
