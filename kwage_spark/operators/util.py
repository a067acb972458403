"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None
                       ) -> DataFrame:
    """Widen thin inputs before work-amplifying stages.

    Operators whose per-row cost is large (mapInPandas signature passes,
    explode-by-hundreds shingles) inherit the INPUT partitioning — a
    compact table read as one parquet split serializes the whole stage
    on one task no matter how many cores the session has (measured: the
    exact-containment query spent ~90% of its time this way). At real
    scale inputs arrive in thousands of splits and this returns ``df``
    unchanged; the repartition only fires below the session parallelism.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
