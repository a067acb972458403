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


def test_stream_sessionize_out_of_order_across_batches(spark, tmp_path):
    """Watermark (1 h) longer than the gap (1800 s) admits events OLDER
    than the open session's start in later micro-batches. The fold must
    match the batch gap rule on the union of events: late events form
    their own chronological sessions, the trailing one merges into the
    open session when within the gap, and an in-span event never
    regresses the session end (round-3 advice: per-chunk sorting +
    unconditional `last = sec` corrupted exactly this case)."""
    from kwage_spark.streaming.sessions import sessionize_stream

    src = tmp_path / "events"
    src.mkdir()
    now = time.time()
    # batch 1: open session 10000..10100 (watermark -> 6500)
    _write_chunk(str(src / "c1.parquet"),
                 [(5, 10000), (5, 10100)], now - 30)
    # batch 2, all admitted (>= 6500) but OLDER than parts of the open
    # session: 6600/6610 are > gap below start (own closed session);
    # 9000 is within gap of start (extends the open session backwards);
    # 10050 falls INSIDE the open span (must not regress last=10100)
    _write_chunk(str(src / "c2.parquet"),
                 [(5, 6600), (5, 6610), (5, 9000), (5, 10050)], now - 20)
    # batch 3: 20000 gap-closes the merged session
    _write_chunk(str(src / "c3.parquet"), [(5, 20000)], now - 10)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    sessions = sessionize_stream(stream, gap_sec=1800, watermark="1 hour")
    q = (sessions.writeStream.format("memory").queryName("sess_ooo")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user_id"], r["session_start"] - BASE,
            r["session_end"] - BASE, r["n_events"])
           for r in spark.sql("SELECT * FROM sess_ooo").collect()}
    # identical to the batch fold over the event union:
    # [6600, 6610] | [9000, 10000, 10050, 10100] | [20000 open]
    assert (5, 6600, 6610, 2) in got
    assert (5, 9000, 10100, 4) in got
    assert len([g for g in got if g[0] == 5]) == 2
