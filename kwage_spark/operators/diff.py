"""Sketch-table inspection tools — diff and dump.

The reference ships `bloom_diff.cpp:14-255` (pairwise XOR + popcount of
two filter sets) and `dump_db.cpp:23-326` / `db_debug.cpp` (decode and
print filter headers). DataFrame analogs:

  * sketch_diff(a, b)  — full-outer join on (group, kind); Bloom rows get
    an XOR-popcount bit diff (A6's XOR half), every kind gets a payload
    equality verdict; one-sided groups are flagged. The first tool to
    reach for when two sketch stores disagree.
  * dump_states(df)    — per-row header decode (kind, params, n_items,
    payload bytes), crc-verified, without materializing payloads anywhere.

Both run executor-side (mapInPandas over the joined/selected rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.bloom import BloomState
from ..kernels.registry import state_from_bytes


def sketch_diff(a: DataFrame, b: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Compare two sketch tables row-by-row.

    Output: group_cols…, kind, status ('both'|'left_only'|'right_only'),
    equal boolean, xor_popcount long (Bloom rows: number of differing
    bits, the `bloom_diff` metric; other kinds: null).
    """
    gk = group_cols + ["kind"]
    left = a.select(*gk, F.col("state").alias("state_a"))
    right = b.select(*gk, F.col("state").alias("state_b"))
    joined = left.join(right, gk, "full_outer")
    keys = ", ".join(f"{c} string" for c in group_cols)
    schema = (f"{keys}, kind string, status string, equal boolean, "
              "xor_popcount long")

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                sa, sb = d.pop("state_a"), d.pop("state_b")
                if sa is None or sb is None:
                    d.update(status="left_only" if sb is None else "right_only",
                             equal=False, xor_popcount=None)
                    rows.append(d)
                    continue
                ba, bb = bytes(sa), bytes(sb)
                st_a = state_from_bytes(ba)  # decode = crc verification
                st_b = state_from_bytes(bb)
                xpc = None
                if isinstance(st_a, BloomState) and isinstance(st_b, BloomState):
                    if st_a.params.log2_m == st_b.params.log2_m:
                        xpc = int(np.unpackbits(
                            np.bitwise_xor(st_a.bits, st_b.bits)).sum())
                d.update(status="both", equal=ba == bb, xor_popcount=xpc)
                rows.append(d)
            if rows:
                yield pd.DataFrame(rows)

    return joined.mapInPandas(diff, schema=schema)


def dump_states(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Decode every state header into inspectable columns (≙ dump_db):
    group_cols…, kind, params string, n_items long, state_bytes long.
    Decode is crc-verified; corruption raises with the failing group."""
    keys = ", ".join(f"{c} string" for c in group_cols)
    schema = (f"{keys}, kind string, params string, n_items long, "
              "state_bytes long")

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = {c: getattr(r, c) for c in group_cols}
                blob = bytes(r.state)
                st = state_from_bytes(blob)
                if isinstance(st, BloomState):
                    params = (f"log2_m={st.params.log2_m} "
                              f"num_hash={st.params.num_hash} k={st.params.k}")
                elif hasattr(st, "p"):
                    params = f"p={st.p}"
                elif hasattr(st, "log2_w"):
                    params = f"log2_w={st.log2_w} depth={st.depth}"
                elif hasattr(st, "delta"):
                    params = f"delta={st.delta}"
                else:
                    params = f"k={st.k}"
                d.update(kind=r.kind, params=params,
                         n_items=int(getattr(st, "n_items",
                                             getattr(st, "n_total", 0))),
                         state_bytes=len(blob))
                rows.append(d)
            if rows:
                yield pd.DataFrame(rows)

    cols = group_cols + ["kind", "state"]
    return df.select(*cols).mapInPandas(dump, schema=schema)
