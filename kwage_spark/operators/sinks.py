"""Search-result sinks — CSV (S11, `output.h:35-59`) and BIGSI-python-
compatible JSON (S12, `output.h:61-112`).

Field names and shapes follow the reference: per-query records carry
``num_kmers``, ``num_kmers_found``, ``percent_kmers_found`` plus the
group metadata; JSON keys mirror BIGSI-python's results format, with the
threshold rendered at fixed 1-decimal precision (`output.h:75-82`).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_results_csv(results: DataFrame, path: str,
                      group_cols: list[str] | None = None) -> None:
    """query,num_kmers,num_kmers_found,percent_kmers_found,<group cols>,
    [sample_metadata] — the reference CSV shape (S11, `output.h:35-59`);
    the metadata map is rendered as a JSON string (CSV has no map type)."""
    gcols = group_cols or [c for c in results.columns
                           if c not in ("query_id", "num_kmers",
                                        "num_kmers_found", "percent_kmers_found",
                                        "sample_metadata")]
    out = results
    meta_cols = []
    if "sample_metadata" in results.columns:
        out = out.withColumn("sample_metadata", F.to_json("sample_metadata"))
        meta_cols = ["sample_metadata"]
    cols = (["query_id", "num_kmers", "num_kmers_found",
             "percent_kmers_found"] + gcols + meta_cols)
    (out.select(*cols)
     .write.mode("overwrite").option("header", True).csv(path))


def results_to_bigsi_json(results: DataFrame, threshold: float,
                          group_cols: list[str] | None = None) -> str:
    """Driver-side JSON string in BIGSI-python results shape:
    {query_id: {"threshold": 0.5, "results": [{sample metadata,
    percent_kmers_found, num_kmers, num_kmers_found}, ...]}}
    Result lists keep descending num_kmers_found order (Q8).

    Float formatting follows `output.h:75-82` exactly: the reference sets
    the stream to fixed 1-decimal for the threshold and (the manipulators
    persist) prints percent_kmers_found the same way — so both are
    emitted as numbers rounded to one decimal, never scientific."""
    gcols = group_cols or [c for c in results.columns
                           if c not in ("query_id", "num_kmers",
                                        "num_kmers_found", "percent_kmers_found",
                                        "sample_metadata")]
    has_meta = "sample_metadata" in results.columns
    rows = results.orderBy("query_id", F.desc("num_kmers_found")).collect()
    out: dict[str, dict] = {}
    for r in rows:
        q = out.setdefault(str(r["query_id"]), {
            # fixed 1-decimal threshold (a NUMBER, not a string) —
            # `std::showpoint << setprecision(1) << fixed`, output.h:75-82
            "threshold": round(float(threshold), 1),
            "results": [],
        })
        rec = {c: r[c] for c in gcols}
        if has_meta:
            rec["sample_metadata"] = dict(r["sample_metadata"] or {})
        rec.update({
            # the stream manipulators persist: percent is fixed(1) too
            "percent_kmers_found": round(float(r["percent_kmers_found"]), 1),
            "num_kmers": r["num_kmers"],
            "num_kmers_found": r["num_kmers_found"],
        })
        q["results"].append(rec)
    return json.dumps(out, sort_keys=True)


def write_results_json(results: DataFrame, path: str) -> None:
    """Distributed JSON-lines sink for large result sets."""
    results.write.mode("overwrite").json(path)
