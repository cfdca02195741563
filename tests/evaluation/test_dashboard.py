"""Benchmark-comparison dashboard tests."""

import json
import os

import numpy as np

from gtsfm_tpu.evaluation import dashboard


def _write_run(root, bench, values):
    d = os.path.join(root, bench, "result_metrics")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(values, f)


def test_percent_change():
    assert dashboard.percent_change(10.0, 12.0) == 20.0
    assert dashboard.percent_change(10.0, 8.0) == -20.0
    assert dashboard.percent_change(0.0, 0.0) == 0.0
    assert not np.isfinite(dashboard.percent_change(0.0, 1.0))


def test_cell_color_direction():
    # +20% improvement -> green anchor; -20% -> red anchor; 0 -> pale yellow.
    assert dashboard._cell_color(20.0) == "#31b404"
    assert dashboard._cell_color(-20.0) == "#df0101"
    assert dashboard._cell_color(0.0) == "#f5f6ce"
    # Clipping.
    assert dashboard._cell_color(500.0) == "#31b404"


def test_lower_is_better_heuristic():
    assert dashboard._lower_is_better("rotation_angular_errors_deg")
    assert dashboard._lower_is_better("total_runtime_sec")
    assert not dashboard._lower_is_better("num_inlier_edges")


def test_dashboard_html(tmp_path):
    master = str(tmp_path / "master")
    branch = str(tmp_path / "branch")
    vals_m = {
        "ba_metrics": {"num_tracks": 100, "mean_reproj_error_px": 1.0,
                       "track_lengths": {"median": 3.0}},
    }
    vals_b = {
        "ba_metrics": {"num_tracks": 120, "mean_reproj_error_px": 0.8,
                       "track_lengths": {"median": 3.5}},
    }
    for bench in ("door-12-sift", "skydio-8-lightglue"):
        _write_run(master, bench, vals_m)
        _write_run(branch, bench, vals_b)

    out = str(tmp_path / "dash.html")
    html_text = dashboard.generate_dashboard_html(master, branch, out)
    assert os.path.isfile(out)
    assert "door-12-sift" in html_text and "skydio-8-lightglue" in html_text
    assert "ba_metrics" in html_text
    # num_tracks +20% (higher better -> green anchor), reproj -20% (lower
    # better -> also green anchor). No red cells in this all-improvement diff.
    assert "#31b404" in html_text
    assert "#df0101" not in html_text
    # Distribution summaries compared by median.
    assert "3 → 3.5" in html_text


def test_tables_skip_missing(tmp_path):
    master = str(tmp_path / "m")
    branch = str(tmp_path / "b")
    _write_run(master, "only-in-master", {"g": {"x": 1}})
    os.makedirs(os.path.join(branch, "empty"), exist_ok=True)
    tables, cols = dashboard.build_comparison_tables(master, branch)
    assert cols == [] and tables == {}
