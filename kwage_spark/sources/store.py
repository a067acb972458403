"""Persistent sketch store with partition-pruned lookups.

The reference packs filters into .db files and discovers them by directory
walk (S7/S9, `build_db.cpp:24-456`, `options.cpp:74-137`); its query
engine then reads every file. Our store hash-buckets sketch rows by the
leading group column so that group-restricted reads PRUNE partitions at
the scan — the Spark analog of KWAGE's per-file metadata offsets
(`kwage.h:34-44`), but enforced by the storage layout instead of seeks.

Iceberg is used when the runtime catalog is configured (format name
"iceberg"); otherwise hive-style partitioned parquet gives the same
pruning semantics. Both are written through the same API, so callers
never branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def _with_bucket(df: DataFrame, group_col: str, buckets: int) -> DataFrame:
    # xxhash64 is Spark-native (no Python), stable across sessions — the
    # same expression is reused at read time for pruning predicates
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(group_col)), F.lit(buckets))
        .cast("int"))


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def write_sketch_store(sketches: DataFrame, path: str, group_col: str,
                       buckets: int = 64, mode: str = "overwrite",
                       format: str = "parquet") -> None:
    """Persist sketch rows bucketed by hash(group_col).

    ~64 buckets keeps files large at 100 TB-derived sketch volumes while
    making single-group reads touch 1/64th of the data (≙ KWAGE's ≤2048
    filters/file packing, `options.h:137-138`, but pruned by layout).

    ``format`` is EXPLICIT ('parquet' | 'iceberg'), never inferred from
    classpath + path shape: an 's3a://' or relative parquet path must not
    silently route to a catalog lookup. With 'iceberg', ``path`` is a
    table identifier and ``mode`` maps to append / createOrReplace.
    """
    out = _with_bucket(sketches, group_col, buckets)
    if format == "iceberg":
        if not iceberg_available(sketches.sparkSession):
            raise RuntimeError("format='iceberg' but no Iceberg runtime "
                               "on the classpath")
        w = out.writeTo(path).partitionedBy(F.col(BUCKET_COL))
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    if format != "parquet":
        raise ValueError(f"unknown store format {format!r}")
    (out.write.mode(mode).partitionBy(BUCKET_COL).parquet(path))


def _read_store(spark: SparkSession, path: str, format: str) -> DataFrame:
    if format == "iceberg":
        return spark.read.format("iceberg").load(path)
    if format != "parquet":
        raise ValueError(f"unknown store format {format!r}")
    return spark.read.parquet(path)


def read_sketch_store(spark: SparkSession, path: str,
                      format: str = "parquet") -> DataFrame:
    return _read_store(spark, path, format).drop(BUCKET_COL)


def discover_sketch_stores(spark: SparkSession, root: str,
                           max_depth: int = 8) -> list[str]:
    """Recursive store discovery (S9, ≙ KWAGE's directory walk for .db
    files, `options.cpp:74-137`): return every directory under ``root``
    that looks like a sketch store (contains ``{BUCKET_COL}=*`` partition
    dirs). Uses the Hadoop FileSystem API, so it works on hdfs:///
    s3a:// paths as well as local ones."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    start = Path(root)
    fs = start.getFileSystem(conf)
    found: list[str] = []

    def walk(p, depth: int) -> None:
        if depth > max_depth or not fs.isDirectory(p):
            return
        children = fs.listStatus(p)
        names = [c.getPath().getName() for c in children]
        if any(n.startswith(f"{BUCKET_COL}=") for n in names):
            found.append(p.toString())
            return  # a store's partition dirs aren't themselves stores
        for c in children:
            if c.isDirectory():
                walk(c.getPath(), depth + 1)

    if fs.exists(start):
        walk(start, 0)
    return sorted(found)


def read_all_sketch_stores(spark: SparkSession, root: str,
                           format: str = "parquet") -> DataFrame:
    """Union every discovered store under ``root`` (the read side of the
    reference's recursive .db ingestion; merge duplicate groups afterwards
    with merge_sketch_tables if stores overlap)."""
    paths = discover_sketch_stores(spark, root)
    if not paths:
        raise FileNotFoundError(f"no sketch stores under {root}")
    dfs = [read_sketch_store(spark, p, format=format) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _bucket_file_counts(spark: SparkSession, path: str) -> dict[int, int]:
    """data-file count per ``{BUCKET_COL}=n`` partition directory."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(path)
    fs = root.getFileSystem(conf)
    counts: dict[int, int] = {}
    if not fs.exists(root):
        return counts
    for child in fs.listStatus(root):
        name = child.getPath().getName()
        if not (child.isDirectory() and name.startswith(f"{BUCKET_COL}=")):
            continue
        bucket = int(name.split("=", 1)[1])
        n = sum(1 for f in fs.listStatus(child.getPath())
                if not f.getPath().getName().startswith(("_", ".")))
        counts[bucket] = n
    return counts


def compact_sketch_store(spark: SparkSession, path: str,
                         group_cols: list[str] | None = None,
                         target_files_per_bucket: int = 1) -> dict:
    """Bin-pack a store's small files after many incremental writes —
    the A13 analog of the reference's smallest-first .db merge pass
    (`merge_db.cpp:215-248`): every ``mode='append'`` ingest adds a file
    wave per bucket, and a store that accrues N increments makes every
    group lookup open N files.

    Only OVER-FRAGMENTED buckets (more data files than
    ``target_files_per_bucket``) are rewritten, via dynamic partition
    overwrite — already-compact buckets are untouched and the call is a
    no-op on a compact store. When ``group_cols`` is given, duplicate
    (group…, kind) rows from incremental appends of the SAME group are
    folded through the state merge (merge_grouped_states), so lookups
    return one mergeable row per group again.

    Returns {"buckets_compacted", "files_before", "files_after"}.
    """
    from ..operators.merge import merge_grouped_states

    counts = _bucket_file_counts(spark, path)
    files_before = sum(counts.values())
    hot = sorted(b for b, n in counts.items()
                 if n > target_files_per_bucket)
    if not hot:
        return {"buckets_compacted": 0, "files_before": files_before,
                "files_after": files_before}

    df = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(hot))
    if group_cols:
        df = merge_grouped_states(df, [*group_cols, BUCKET_COL]) \
            if BUCKET_COL not in group_cols else merge_grouped_states(
                df, group_cols)
    if target_files_per_bucket <= 1:
        packed = df.repartition(F.col(BUCKET_COL))
    else:
        slot = F.pmod(F.xxhash64(*[c for c in df.columns
                                   if c != "state"][:3]),
                      F.lit(target_files_per_bucket))
        packed = df.repartition(F.col(BUCKET_COL), slot)
    # cut the plan's file-source dependency so the overwrite of the path
    # being read is legal; blocks stay on executors (only hot buckets)
    packed = packed.localCheckpoint(eager=True)

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(mode_key, None)
    spark.conf.set(mode_key, "dynamic")
    try:
        (packed.write.mode("overwrite").partitionBy(BUCKET_COL)
         .parquet(path))
    finally:
        if old is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, old)
    after = _bucket_file_counts(spark, path)
    return {"buckets_compacted": len(hot),
            "files_before": files_before,
            "files_after": sum(after.values())}


def read_sketch_group(spark: SparkSession, path: str, group_col: str,
                      value: str, buckets: int = 64,
                      format: str = "parquet") -> DataFrame:
    """Point lookup of one group's sketch rows.

    The bucket predicate is computed from the SAME hash expression used
    at write time, so the scan prunes to one partition directory before
    the row filter applies (verify via PartitionFilters in the plan).
    """
    df = _read_store(spark, path, format)
    bucket = F.pmod(F.xxhash64(F.lit(value)), F.lit(buckets)).cast("int")
    return (df.filter((F.col(BUCKET_COL) == bucket)
                      & (F.col(group_col) == value))
            .drop(BUCKET_COL))
