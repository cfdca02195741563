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
