"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       key_cols: list[str] | None = None) -> DataFrame:
    """Widen thin inputs before work-amplifying stages.

    Operators whose per-row cost is large (mapInPandas signature passes,
    explode-by-hundreds shingles) inherit the INPUT partitioning — a
    compact table read as one parquet split serializes the whole stage
    on one task no matter how many cores the session has (measured: the
    exact-containment query spent ~90% of its time this way). At real
    scale inputs arrive in thousands of splits and this returns ``df``
    unchanged; the repartition only fires below the session parallelism.

    Safety: streaming DataFrames pass through untouched (``df.rdd`` is
    undefined for them, and micro-batch parallelism is the source's
    concern), and a partition probe that fails for any reason degrades
    to no widening rather than breaking the operator. Callers whose
    input is KNOWN to be trivially small (a scoped test query) should
    skip the widen at the call site — the probe itself can cost a
    hidden job under AQE when the plan has upstream shuffles.

    ``key_cols``: when the caller knows a (near-)unique key, widen by
    HASH partitioning on it instead of round-robin — a keyless
    ``repartition(n)`` first pays a local sort of its input
    (spark.sql.execution.sortBeforeRepartition, needed so retried tasks
    reproduce the row→partition assignment), while hash partitioning on
    a deterministic column needs no sort and stays retry-safe
    (guide §2.5: derive synthetic keys deterministically).
    """
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — plan not probe-able; keep as-is
        return df
    if n < target:
        if key_cols:
            return df.repartition(target, *key_cols)
        return df.repartition(target)
    return df
