"""Custom stateful streaming operator (applyInPandasWithState):
per-user sessionization with event-time timeouts, semantics matching
the oracle-green batch `sessionize_users` gap rule (gap > 1800 s starts
a new session)."""

import os
import time

import pandas as pd

BASE = 1_600_000_000


def _write_chunk(path: str, rows, mtime: float) -> None:
    pdf = pd.DataFrame(rows, columns=["user_id", "sec"])
    pdf["ts"] = (pd.to_datetime(pdf.pop("sec") + BASE, unit="s")
                 .astype("datetime64[us]"))  # nanos confuse the Spark reader
    pdf.to_parquet(path, index=False, coerce_timestamps="us")
    os.utime(path, (mtime, mtime))


def test_stream_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    from kwage_spark.streaming.sessions import sessionize_stream

    src = tmp_path / "events"
    src.mkdir()
    now = time.time()
    # chunk order = file mtime order (maxFilesPerTrigger=1 → 3 batches)
    _write_chunk(str(src / "c1.parquet"),
                 [(1, 0), (1, 100), (2, 0), (2, 50)], now - 30)
    _write_chunk(str(src / "c2.parquet"),
                 [(1, 5000), (2, 60), (2, 4000), (99, 200000)], now - 20)
    _write_chunk(str(src / "c3.parquet"), [(99, 200001)], now - 10)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    sessions = sessionize_stream(stream, gap_sec=1800, watermark="1 hour")
    q = (sessions.writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user_id"], r["session_start"] - BASE,
            r["session_end"] - BASE, r["n_events"])
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    # gap-closure: user 1's first session closed by its 5000s event;
    # user 2's 0-60s run (3 events, folded ACROSS micro-batches) closed
    # by its 4000s event
    assert (1, 0, 100, 2) in got
    assert (2, 0, 60, 3) in got
    # timeout-closure: once the watermark (driven by user 99's events)
    # passes last+gap, the open sessions emit WITHOUT another event from
    # those users — the streaming-only behavior
    assert (1, 5000, 5000, 1) in got
    assert (2, 4000, 4000, 1) in got
    # user 99's session stays open (no later watermark) — not emitted
    assert not any(u == 99 for u, *_ in got)
