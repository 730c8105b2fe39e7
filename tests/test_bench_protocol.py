"""Unit tests for bench.py's storm-gating round selection (pure logic —
no Spark): flagged rounds are excluded only when enough clean rounds
exist, so an all-storm window is still reported from full data."""

import bench


def test_clean_rounds_selected_when_enough():
    # rounds 1 and 3 stormy -> excluded (3 clean rounds remain)
    assert bench._used_rounds([1.0, 0.5, 0.95, 0.7, 1.1]) == [0, 2, 4]


def test_all_rounds_kept_when_too_few_clean():
    # only 2 clean rounds (< _MIN_CLEAN): keep everything
    assert bench._used_rounds([1.0, 0.5, 0.95, 0.7, 0.6]) == [0, 1, 2, 3, 4]


def test_all_storm_window_keeps_all():
    probes = [0.5] * 8
    assert bench._used_rounds(probes) == list(range(8))


def test_threshold_is_inclusive():
    assert bench._used_rounds([bench._CEIL_OK] * 3) == [0, 1, 2]


def test_record_history_appends_and_pools(tmp_path):
    """The run-history section pools clean round ratios across runs of the
    same protocol, ignores other input sizes and corrupt lines, and reports
    the latest run honestly even when it is below the bar."""
    import json

    from bench import record_history

    p = str(tmp_path / "history.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"bench_turns": 600000, "ratios_used": [4.0, 3.6, 3.2],
                            "efficiency": 0.9}) + "\n")
        f.write("not json\n")  # corrupt line must be skipped
        f.write(json.dumps({"bench_turns": 60000, "ratios_used": [2.0],
                            "efficiency": 0.5}) + "\n")  # smoke run: other protocol
    md = record_history(p, 600000, [3.0, 3.2, 2.8], 0.795, 4000.0, 12720.0)
    # this run appended to the file
    rows = [json.loads(l) for l in open(p) if l.strip().startswith("{")]
    assert rows[-1]["efficiency"] == 0.795
    # only the two 600000-turn runs pool: ratios 4.0,3.6,3.2 + 3.0,3.2,2.8
    # -> sorted [2.8,3.0,3.2,3.2,3.6,4.0], median 3.2 -> 0.8
    assert "Pooled median over all 6 clean round ratios: **0.800**" in md
    assert "1 of 2 runs" in md
    assert "| 2 | 3.00, 3.20, 2.80 | 0.795 |" in md
    # the smoke run must not appear
    assert "2.00" not in md
