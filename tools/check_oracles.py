"""Local replica of the driver's DuckDB-oracle comparison.

Runs every (spark, oracle) pair from kwage_spark.queries at a given
sf_dir and compares row count, sorted column names, and an
order-insensitive multiset of stringified rows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from kwage_spark import queries_pipeline, queries_sketch  # noqa: E402,F401
from kwage_spark.queries import TABLES, oracle_queries, spark_queries  # noqa: E402
from kwage_spark.sources.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark(app="oracle_check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sq, oq = spark_queries(), oracle_queries()
    failures = 0
    for name, fn in sq.items():
        if only and name not in only:
            continue
        if name not in oq:
            df = fn(spark, sf_dir)
            print(f"{name:32s} rows-only: {df.count()} rows")
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(oq[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok_vals = ok_cols and rows_multiset(scols, srows) == rows_multiset(ocols, orows)
        status = "OK" if (ok_cols and ok_n and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{name:32s} {status} cols={ok_cols} n=({len(srows)},{len(orows)}) vals={ok_vals}")
            if ok_cols and not ok_vals:
                a = rows_multiset(scols, srows)
                b = rows_multiset(ocols, orows)
                onlya = [x for x in a if x not in set(b)][:3]
                onlyb = [x for x in b if x not in set(a)][:3]
                print(f"   spark-only: {onlya}\n   duck-only:  {onlyb}")
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck cols:  {sorted(ocols)}")
        else:
            print(f"{name:32s} OK ({len(srows)} rows)")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf, sys.argv[2:] or None) else 0)
