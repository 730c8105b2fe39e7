"""Watermark semantics of the windowed ingest-metrics stream: a window is
emitted exactly once when the watermark passes its end, a straggler for an
already-emitted window is dropped (not merged into the emitted row), and
the checkpoint carries the watermark across drains — a straggler arriving
in a LATER drain is still fenced by the watermark persisted in the earlier
one.  (A straggler to a still-open window is merged — that is Spark's
append-mode contract: the late filter fences closed state, the delay
parameter decides how long a window stays open.)"""

import datetime as dt
import glob
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_mini_service_spark.streaming import run_windowed_metrics


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def _write(input_dir, name, rows):
    # flat files directly in the stream dir: the file source does not
    # recurse into subdirectories (no partition inference with a user schema)
    os.makedirs(input_dir, exist_ok=True)
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts": pa.array(cols[5], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, f"{input_dir}/{name}.parquet")
    time.sleep(1.1)  # distinct mtimes -> deterministic file-stream order


def _out(spark, output_dir):
    if not glob.glob(f"{output_dir}/*.parquet"):
        return pd.DataFrame(
            columns=["window_start", "window_end", "role", "n_turns", "n_chars"]
        )
    return (
        spark.read.parquet(output_dir)
        .toPandas()
        .sort_values(["window_start", "role"])
        .reset_index(drop=True)
    )


def test_windowed_metrics_watermark(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drain 1 — file 1: two on-time turns in window [0,1); file 2 advances
    # the watermark to 3:30 - 2h = 1:30, so [0,1) closes and emits
    _write(input_dir, "f1", [
        ("c1", 0, "user", "abc", None, _ts(0, 10)),
        ("c1", 1, "user", "defg", None, _ts(0, 40)),
    ])
    _write(input_dir, "f2", [
        ("c2", 0, "assistant", "hi", None, _ts(3, 30)),
    ])
    run_windowed_metrics(spark, input_dir, output_dir, ckpt)
    out1 = _out(spark, output_dir)

    w0 = out1[out1["window_start"] == _ts(0)]
    assert len(w0) == 1  # emitted exactly once, user role only
    assert w0.iloc[0]["role"] == "user"
    assert w0.iloc[0]["n_turns"] == 2
    assert w0.iloc[0]["n_chars"] == 7          # abc + defg
    assert (out1["window_start"] != _ts(3)).all()  # hour-3 window still open

    # drain 2 — a straggler for the ALREADY-CLOSED [0,1) window arrives.
    # The checkpoint carried the watermark (1:30) across the restart, so the
    # straggler is dropped, not merged into the emitted row; the fresh 5:00
    # turn only moves the watermark to 3:00, so [3,4) stays open (end 4:00).
    _write(input_dir, "f3", [
        ("c3", 0, "user", "late!", None, _ts(0, 50)),
        ("c3", 1, "user", "x", None, _ts(5, 0)),
    ])
    run_windowed_metrics(spark, input_dir, output_dir, ckpt)
    out2 = _out(spark, output_dir)

    w0 = out2[out2["window_start"] == _ts(0)]
    assert len(w0) == 1                        # NOT re-emitted
    assert w0.iloc[0]["n_turns"] == 2          # straggler dropped
    assert w0.iloc[0]["n_chars"] == 7          # no 'late!'
    assert (out2["window_start"] != _ts(3)).all()

    # drain 3 — 9:00 advances the watermark to 7:00: the hour-3 and hour-5
    # windows emit now; [0,1) is still exactly-once
    _write(input_dir, "f4", [
        ("c4", 0, "user", "y", None, _ts(9, 0)),
    ])
    run_windowed_metrics(spark, input_dir, output_dir, ckpt)
    out3 = _out(spark, output_dir)

    assert len(out3[out3["window_start"] == _ts(0)]) == 1
    w3 = out3[out3["window_start"] == _ts(3)]
    assert len(w3) == 1 and w3.iloc[0]["n_turns"] == 1
    w5 = out3[out3["window_start"] == _ts(5)]
    assert len(w5) == 1 and w5.iloc[0]["n_chars"] == 1
