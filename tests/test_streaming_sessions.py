"""Custom stateful streaming operator (applyInPandasWithState):
gap-based conversation sessionization — within-drain gap closes, event-time
timeout flushes, and checkpointed state carried across drains."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_mini_service_spark.streaming import run_session_stream

T0 = pd.Timestamp("2024-03-01 12:00:00")


def _turns(rows):
    """rows: (conv_id, turn_idx, text, ts_offset_sec) -> transcripts frame."""
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": [None] * len(rows),
            "ts": pd.Series(
                [T0 + pd.Timedelta(seconds=r[3]) for r in rows]
            ).astype("datetime64[us]"),
        }
    )


def test_session_stream_gap_close_timeout_flush_and_resume(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    import os

    os.makedirs(inp)
    # drain 1 — two files = two micro-batches (maxFilesPerTrigger=1):
    # conv A session 1 spans BOTH batches (state must persist between
    # micro-batches); the t0+3600s turn is > gap after it and closes it
    # mid-stream; conv B is a single turn left open.
    a = _turns([("A", 0, "aaaa", 0), ("A", 1, "bb", 60), ("B", 0, "ccc", 0)])
    b = _turns([("A", 2, "d", 120), ("A", 3, "eeeee", 3600)])
    pq.write_table(pa.Table.from_pandas(a, preserve_index=False), f"{inp}/a.parquet")
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False), f"{inp}/b.parquet")
    run_session_stream(spark, inp, out, ckpt, gap_minutes=30, watermark="1 minute")
    got1 = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("conv_id", "session_start", "session_end", "n_turns", "n_chars")
        .collect()
    }
    sess_a1 = (
        "A",
        T0.to_pydatetime(),
        (T0 + pd.Timedelta(seconds=120)).to_pydatetime(),
        3,
        4 + 2 + 1,
    )
    sess_b = ("B", T0.to_pydatetime(), T0.to_pydatetime(), 1, 3)
    # A's first session closes on the in-stream gap; B's flushes by
    # event-time timeout within the drain (availableNow runs a final
    # watermark-advance batch: watermark t0+3540s > B's t0+1800s timeout).
    # A's second session (timeout t0+5400s) must still be OPEN state.
    assert got1 == {sess_a1, sess_b}

    # drain 2 — two far-future sentinel files advance the watermark past
    # A's open second session; it flushes from CHECKPOINTED state (created
    # in drain 1) via event-time timeout.
    c = _turns([("Z1", 0, "x", 2 * 86400)])
    d = _turns([("Z2", 0, "y", 3 * 86400)])
    pq.write_table(pa.Table.from_pandas(c, preserve_index=False), f"{inp}/c.parquet")
    pq.write_table(pa.Table.from_pandas(d, preserve_index=False), f"{inp}/d.parquet")
    run_session_stream(spark, inp, out, ckpt, gap_minutes=30, watermark="1 minute")
    got2 = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("conv_id", "session_start", "session_end", "n_turns", "n_chars")
        .collect()
        if r["conv_id"] in ("A", "B")
    }
    t3600 = (T0 + pd.Timedelta(seconds=3600)).to_pydatetime()
    want = {sess_a1, sess_b, ("A", t3600, t3600, 1, 5)}
    assert got2 == want

    # a third drain with no new files must be a no-op (idempotent resume)
    run_session_stream(spark, inp, out, ckpt, gap_minutes=30, watermark="1 minute")
    got3 = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("conv_id", "session_start", "session_end", "n_turns", "n_chars")
        .collect()
        if r["conv_id"] in ("A", "B")
    }
    assert got3 == want


def test_session_stream_late_turn_does_not_regress_last_activity(spark, tmp_path):
    """A late-but-within-watermark turn arriving in a LATER micro-batch must
    not move last-activity backwards: with regression, the next turn at
    exactly the gap boundary would wrongly split the session."""
    import os

    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    a = _turns([("A", 0, "aa", 60)])
    # late 30s-old turn (inside the 1-minute watermark slack) + a turn at
    # EXACTLY gap seconds after the true last activity (60s): same session
    b = _turns([("A", 1, "b", 30), ("A", 2, "cccc", 60 + 30 * 60)])
    pq.write_table(pa.Table.from_pandas(a, preserve_index=False), f"{inp}/a.parquet")
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False), f"{inp}/b.parquet")
    run_session_stream(spark, inp, out, ckpt, gap_minutes=30, watermark="1 minute")
    # flush via far-future sentinels
    pq.write_table(
        pa.Table.from_pandas(_turns([("Z1", 0, "x", 2 * 86400)]), preserve_index=False),
        f"{inp}/c.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(_turns([("Z2", 0, "y", 3 * 86400)]), preserve_index=False),
        f"{inp}/d.parquet",
    )
    run_session_stream(spark, inp, out, ckpt, gap_minutes=30, watermark="1 minute")
    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("conv_id", "session_start", "session_end", "n_turns", "n_chars")
        .collect()
        if r["conv_id"] == "A"
    }
    want = {
        (
            "A",
            (T0 + pd.Timedelta(seconds=30)).to_pydatetime(),
            (T0 + pd.Timedelta(seconds=60 + 1800)).to_pydatetime(),
            3,
            2 + 1 + 4,
        )
    }
    assert got == want
