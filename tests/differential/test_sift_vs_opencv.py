"""Differential test: our SIFT vs cv2.SIFT_create on real door images.

The reference's SIFT detector-descriptor IS cv2.SIFT_create
(gtsfm/frontend/detector_descriptor/sift.py:24). Floors come from the
measured differential (PERF.md r5, scripts/opencv_differential.py sift):

  - keypoint repeatability ours->cv2 @3px: 54-55%% (different DoG top-k
    policies put half of each detector's points below the other's cut; the
    shared half IS the strong structure)
  - our mutual-NN matches: ~1300/pair vs cv2's ~2650 at default thresholds
    (2050+ at contrast_thresh=0.006 — the gap is contrast-threshold policy)
  - GEOMETRIC PURITY, the metric that matters downstream: 99.2-99.5%% of our
    matches are GT-epipolar-consistent vs cv2's 99.8%%.
"""

import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, "scripts")

import opencv_differential as diff  # noqa: E402

from tests.conftest import reference_data_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_data_available(), reason="no reference data"
)


def test_door_sift_differential():
    out = diff.door_sift_diff(image_pairs=((0, 1),))
    row = out[0]
    # Keypoint repeatability vs the oracle (measured 54% / 32%).
    assert row["rec_oc"] >= 0.40
    assert row["rec_co"] >= 0.25
    # Match volume: ours is intentionally more conservative; floor at 40% of
    # the oracle count (measured ~50%).
    assert row["n_ours"] >= 0.4 * row["n_cv"]
    # Geometric purity — near-parity with the oracle (99.5% vs 99.8%).
    assert row["ei_ours"] >= 0.97
    assert row["ei_cv"] >= 0.97
    assert row["ei_ours"] >= row["ei_cv"] - 0.02
    # Half of our matches are literally the same correspondences cv2 finds.
    assert row["agree"] >= 0.35
