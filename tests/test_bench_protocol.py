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
