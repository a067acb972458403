"""Streaming exact-dedup with Bloom-filter state (dedup_stream):
first-seen docs pass, duplicates drop — within a micro-batch AND across
micro-batches — with O(filter) state per bucket forever."""

import os
import time

import pandas as pd

TEXTS = {
    0: "a distinctive document about spark partitioning",
    1: "another unique text concerning bloom filters and sketches",
    2: "the third document mentions streaming state machines",
    3: "a fourth text on training data curation at scale",
}


def _write_chunk(path: str, rows, mtime: float) -> None:
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf.to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def test_stream_dedup_first_seen_wins(spark, tmp_path):
    from kwage_spark.streaming.dedup_stream import dedup_stream

    src = tmp_path / "docs"
    src.mkdir()
    now = time.time()
    # batch 1: docs 0,1 plus an in-batch duplicate of 0 (id 10)
    _write_chunk(str(src / "c1.parquet"),
                 [(0, TEXTS[0]), (1, TEXTS[1]), (10, TEXTS[0])], now - 30)
    # batch 2: new docs 2,3 plus cross-batch duplicates of 0 and 1
    _write_chunk(str(src / "c2.parquet"),
                 [(2, TEXTS[2]), (11, TEXTS[0]), (12, TEXTS[1]),
                  (3, TEXTS[3])], now - 20)
    # batch 3: everything a duplicate
    _write_chunk(str(src / "c3.parquet"),
                 [(13, TEXTS[2]), (14, TEXTS[3]), (15, TEXTS[0])], now - 10)

    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    out = dedup_stream(stream, n_buckets=8)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM dedup_out").collect()
    # each distinct content emitted exactly once, smallest doc_id won
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3]
    assert len({r["content_sha256"] for r in got}) == 4


def test_stream_dedup_state_is_bounded_bloom(spark, tmp_path):
    """The state blob per bucket is a fixed-size Bloom filter — its size
    does not grow with the number of docs seen (the property a seen-set
    lacks)."""
    from kwage_spark.kernels.bloom import BloomParams
    from kwage_spark.streaming.dedup_stream import (_digest_hashes,
                                                    _fold_bucket)

    params = BloomParams(k=32, log2_m=12, num_hash=3)

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.blob = None

        @property
        def get(self):
            return (self.blob,)

        def update(self, t):
            self.blob = t[0]
            self.exists = True

    st = FakeState()
    import hashlib
    mk = lambda i: [(i, hashlib.sha256(f"doc {i}".encode()).hexdigest())]
    sizes = []
    for wave in range(3):
        rows = pd.DataFrame(
            [r for i in range(wave * 100, wave * 100 + 100)
             for r in mk(i)], columns=["doc_id", "content_sha256"])
        out = list(_fold_bucket((0,), iter([rows]), st, params))
        assert len(out) == 1 and len(out[0]) == 100  # all novel docs pass
        sizes.append(len(st.blob))
    assert sizes[0] == sizes[1] == sizes[2], "state grew with stream length"
    # and a replayed wave emits nothing
    rows = pd.DataFrame(mk(5) + mk(150), columns=["doc_id", "content_sha256"])
    out = list(_fold_bucket((0,), iter([rows]), st, params))
    assert not out
