import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DATA

CRANE = os.path.join(REFERENCE_DATA, "crane_mast_8imgs_colmap_output")


@pytest.mark.skipif(not os.path.isdir(CRANE), reason="crane data not mounted")
def test_colmap_output_to_metrics():
    from gtsfm_tpu.evaluation.compare import colmap_output_to_metrics

    g = colmap_output_to_metrics(CRANE)
    d = g.to_dict()["colmap_model_metrics"]
    assert d["num_images"] == 8
    assert d["num_points3d"] > 100
    assert "track_lengths" in d


def test_compare_runs(tmp_path):
    from gtsfm_tpu.evaluation.compare import compare_runs, format_comparison

    a = {"two_view_metrics": {"num_verified_pairs": 60, "inlier_ratios": {"median": 0.9}}}
    b = {"two_view_metrics": {"num_verified_pairs": 65, "inlier_ratios": {"median": 0.95}}}
    os.makedirs(tmp_path / "a"); os.makedirs(tmp_path / "b")
    json.dump(a, open(tmp_path / "a" / "summary.json", "w"))
    json.dump(b, open(tmp_path / "b" / "summary.json", "w"))
    diff = compare_runs(str(tmp_path / "a"), str(tmp_path / "b"))
    assert diff["two_view_metrics"]["num_verified_pairs"] == (60, 65, 5)
    text = format_comparison(diff)
    assert "num_verified_pairs" in text


def test_frustum_overlap():
    from gtsfm_tpu.common.view_frustum import frustum_points, frustums_overlap

    cal = np.asarray([500.0, 0, 0, 320, 240])
    eye = np.eye(3)
    # Two cameras side by side looking the same way: overlap.
    assert frustums_overlap(eye, np.zeros(3), cal, eye, np.asarray([0.5, 0, 0.0]), cal, 640, 480)
    # Back to back: no overlap.
    flip = np.diag([1.0, -1.0, -1.0])
    assert not frustums_overlap(
        eye, np.zeros(3), cal, flip, np.asarray([0.0, 0, -5.0]), cal, 640, 480
    )
    pts = frustum_points(eye, np.zeros(3), cal, 640, 480)
    assert pts.shape == (9, 3)
    np.testing.assert_allclose(pts[0], 0.0)
