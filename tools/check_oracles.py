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


def main(sf_dir: str, only: list[str] | None = None,
         json_out: str | None = None, oracle_only: bool = False,
         cores: int = 8) -> int:
    spark = get_spark(app="oracle_check", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sq, oq = spark_queries(), oracle_queries()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in sq.items():
        if only and name not in only:
            continue
        if name not in oq:
            if oracle_only:
                continue
            df = fn(spark, sf_dir)
            n = df.count()
            results[name] = {"rows_only": True, "spark_rows": n}
            print(f"{name:32s} rows-only: {n} rows")
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
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok_vals = ok_cols and rows_multiset(scols, srows) == rows_multiset(ocols, orows)
        status = "OK" if (ok_cols and ok_n and ok_vals) else "MISMATCH"
        results[name] = {"rows_match": ok_n, "schema_match": ok_cols,
                         "values_match": ok_vals,
                         "spark_rows": len(srows),
                         "oracle_rows": len(orows)}
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
    if json_out:
        import json
        n_ok = sum(1 for r in results.values()
                   if r.get("values_match") or r.get("rows_only"))
        payload = {"sf_dir": sf_dir, "n_queries": len(results),
                   "n_ok": n_ok, "failures": failures, "queries": results}
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {n_ok}/{len(results)} ok, "
              f"{failures} failures")
    return failures


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--oracle-only", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    a = ap.parse_args()
    sys.exit(1 if main(a.sf_dir, a.names or None, a.json_out,
                       a.oracle_only, a.cores) else 0)
