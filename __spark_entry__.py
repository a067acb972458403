"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship Bloom containment search on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2);
                 SQL-expressible ones have a DuckDB oracle in oracle_sql().
oracle_sql()   — ANSI-SQL twins, verified locally via tools/check_oracles.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kwage_spark import queries as _q              # noqa: E402
from kwage_spark import queries_pipeline as _qp    # noqa: E402
from kwage_spark import queries_sketch as _qs      # noqa: E402

_ = (_qp, _qs)  # imported for their @register side effects


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Bloom containment search over the PERSISTED sketch store
    — write-once hash-bucketed layout, read back with a partition-pruning
    bucket predicate (the reference's flagship shape: a query against
    stored .db files, `kwage.cpp:98-113`, not freshly built sketches).
    The plan shows PartitionFilters on `_bucket` (tests/test_plans.py)."""
    sf_dir = "/root/testdata/sf0.001"
    return _qs.store_pruned_bloom_search(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.spark_queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_queries()
