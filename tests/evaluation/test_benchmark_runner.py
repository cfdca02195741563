"""Benchmark matrix runner tests (fast: tiny synthetic colmap dataset)."""

import json
import os

import numpy as np

from gtsfm_tpu.evaluation import benchmark_runner


def test_matrix_skips_missing(tmp_path):
    res = benchmark_runner.run_benchmark(
        str(tmp_path / "nonexistent_data"), str(tmp_path / "out"),
        cache_root=str(tmp_path / "cache"),
    )
    assert all(str(v).startswith("skipped") for v in res.values())
    assert set(res) == {m[0] for m in benchmark_runner.DEFAULT_MATRIX}


def test_only_filter():
    names = [m[0] for m in benchmark_runner.DEFAULT_MATRIX]
    assert "door-12-sift" in names
    assert len(set(names)) == len(names)  # unique benchmark names


def test_expectation_floors():
    """Every matrix entry carries accuracy/count floors (VERDICT r4 item 8)
    and check_expectations flags violations."""
    for entry in benchmark_runner.DEFAULT_MATRIX:
        assert len(entry) == 5 and entry[4], f"{entry[0]} has no floors"

    summary = {
        "ba_pose_error_metrics": {"rotation_angle_error_deg": {"max": 0.4}},
        "bundle_adjustment_metrics": {"number_tracks_filtered": 2000},
    }
    ok = benchmark_runner.check_expectations(summary, {
        "ba_pose_error_metrics.rotation_angle_error_deg.max": ("<", 0.5),
        "bundle_adjustment_metrics.number_tracks_filtered": (">=", 1500),
    })
    assert ok == []
    bad = benchmark_runner.check_expectations(summary, {
        "ba_pose_error_metrics.rotation_angle_error_deg.max": ("<", 0.3),
        "two_view_metrics.num_verified_pairs": (">=", 1),
    })
    assert len(bad) == 2
    assert any("MISSING" in b for b in bad)
