"""Sketch-backed queries over the driver testdata (rows-only checked).

These are the non-SQL-expressible operators (custom mergeable sketch
aggregates); the driver records row-count/schema only. Their *accuracy* is
asserted in pytest against exact oracles, and `exact_containment_flagship`
in queries.py is the SQL-checked twin of the Bloom search.

The `documents` table plays the role of the source_files input
(source ≙ repo, text ≙ content).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import SketchConfig
from .kernels.bloom import BloomParams
from .kernels.cms import CMSState
from .kernels.hll import HLLState
from .kernels.kll import KLLState
from .kernels.registry import state_from_bytes
from .operators.ingest import build_sketches, sketch_metrics
from .operators.search import containment_search
from .queries import FLAGSHIP_SNIPPET, KGRAM_K, register

DOC_CFG = SketchConfig(group_cols=("source", "lang"), content_col="text",
                       bloom=BloomParams(k=KGRAM_K, log2_m=16, num_hash=3),
                       hll_p=12, cms_log2_w=12, cms_depth=4, kll_k=200)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_sketches(_docs(spark, sf_dir), DOC_CFG)


@register("bloom_containment_search")  # flagship: SURVEY Q2-Q5/S12
def bloom_containment_search(spark, sf_dir):
    sk = doc_sketches(spark, sf_dir)
    return containment_search(sk, [(0, FLAGSHIP_SNIPPET)], DOC_CFG, threshold=0.5)


@register("sketch_build_metrics", f"""
WITH agg AS (
  SELECT CAST(count(DISTINCT source || chr(10) || lang) AS BIGINT) AS n_groups,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(greatest(length(text) - {KGRAM_K - 1}, 0)) AS BIGINT) AS n_kgrams
  FROM documents
)
SELECT kind, n_groups, n_rows, n_kgrams
FROM agg CROSS JOIN (SELECT unnest(['bloom', 'hll', 'cms', 'kll']) AS kind)
""")
def sketch_build_metrics(spark, sf_dir):
    """A14 running totals. n_groups / n_rows / n_kgrams are EXACT counters
    carried through the sketch build (`maestro_main.cpp:956-983` analog),
    so they get a DuckDB twin; state_bytes (serialization-dependent) stays
    on the library `sketch_metrics` surface only."""
    return (sketch_metrics(doc_sketches(spark, sf_dir))
            .select("kind", "n_groups", "n_rows", "n_kgrams")
            .orderBy("kind"))


def _decode_states(sk: DataFrame, kind: str) -> pd.DataFrame:
    pdf = sk.filter(F.col("kind") == kind).toPandas()
    pdf["st"] = pdf["state"].map(lambda b: state_from_bytes(bytes(b)))
    return pdf


@register("hll_distinct_kgrams")  # A15 — HLL estimate per group
def hll_distinct_kgrams(spark, sf_dir):
    pdf = _decode_states(doc_sketches(spark, sf_dir), "hll")
    out = pd.DataFrame({
        "source": pdf["source"], "lang": pdf["lang"],
        "est_distinct_kgrams": [int(st.estimate()) for st in pdf["st"]],
    })
    return spark.createDataFrame(out.sort_values(["source", "lang"]))


@register("cms_token_frequencies")  # A2 — CMS point queries for fixed tokens
def cms_token_frequencies(spark, sf_dir):
    sk = doc_sketches(spark, sf_dir)
    pdf = _decode_states(sk, "cms")
    whole = CMSState(DOC_CFG.cms_log2_w, DOC_CFG.cms_depth)
    for st in pdf["st"]:
        whole.merge(st)
    probes = ["table va", "hash val", "row scan", "filter d", "zz-never"]
    wins = np.stack([np.frombuffer(p.encode()[:KGRAM_K].ljust(KGRAM_K), dtype=np.uint8)
                     for p in probes])
    est = whole.query_windows(wins)
    return spark.createDataFrame(
        pd.DataFrame({"probe": probes, "est_count": est.astype("int64")}))


@register("kll_size_quantiles")  # A16 — per-lang file-size quantiles
def kll_size_quantiles(spark, sf_dir):
    cfg = SketchConfig(group_cols=("lang",), content_col="text",
                       size_col="n_chars", kinds=("kll",),
                       bloom=DOC_CFG.bloom, kll_k=200)
    sk = build_sketches(_docs(spark, sf_dir), cfg)
    pdf = sk.toPandas()
    pdf["st"] = pdf["state"].map(lambda b: state_from_bytes(bytes(b)))
    rows = [{"lang": r.lang,
             "p25": r.st.quantile(0.25), "p50": r.st.quantile(0.5),
             "p75": r.st.quantile(0.75)} for r in pdf.itertuples()]
    return spark.createDataFrame(pd.DataFrame(rows).sort_values("lang"))


@register("tdigest_size_quantiles")  # A16 twin of kll_size_quantiles:
def tdigest_size_quantiles(spark, sf_dir):
    """t-digest per-lang size quantiles — tail-accurate counterpart of
    KLL for max-size admission policies (F6, `README.md:224`)."""
    cfg = SketchConfig(group_cols=("lang",), content_col="text",
                       size_col="n_chars", kinds=("tdigest",),
                       bloom=DOC_CFG.bloom, tdigest_delta=100)
    sk = build_sketches(_docs(spark, sf_dir), cfg)
    pdf = sk.toPandas()
    pdf["st"] = pdf["state"].map(lambda b: state_from_bytes(bytes(b)))
    rows = [{"lang": r.lang,
             "p01": r.st.quantile(0.01), "p50": r.st.quantile(0.5),
             "p99": r.st.quantile(0.99)} for r in pdf.itertuples()]
    return spark.createDataFrame(pd.DataFrame(rows).sort_values("lang"))


@register("bloom_fp_audit")  # error-bound conformance as a query
def bloom_fp_audit(spark, sf_dir):
    """Per-group measured FP stats vs the published bound (bloom.cpp:47)."""
    pdf = _decode_states(doc_sketches(spark, sf_dir), "bloom")
    rows = []
    for r in pdf.itertuples():
        st = r.st
        bound = st.params.fp_rate(st.n_items)
        load = st.popcount() / st.params.m
        rows.append({"source": r.source, "lang": r.lang,
                     "n_items": int(st.n_items),
                     "fill_ratio": round(load, 6),
                     "fp_bound": round(bound, 6)})
    return spark.createDataFrame(pd.DataFrame(rows).sort_values(["source", "lang"]))
