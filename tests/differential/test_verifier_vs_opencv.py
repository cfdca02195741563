"""Differential tests: our verifier vs the reference's ACTUAL engine.

The reference's RANSAC verifier is `cv2.findEssentialMat(USAC_ACCURATE,
prob=0.999999)` + `cv2.recoverPose` (gtsfm/frontend/verifier/ransac.py:74-81,
gtsfm/utils/verification.py:81). cv2 5.0 is installed here, so the claim
"matches USAC robustness" is asserted against the oracle itself, on identical
inputs (VERDICT r4 item 1). Floors are set from the measured tables in
PERF.md (scripts/opencv_differential.py): median rotation agreement 0.1-0.5
deg and inlier IoU 0.95-1.0 across the sweep; door-12 real pairs agree to
<0.1 deg rotation at IoU ~1.0.
"""

import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

sys.path.insert(0, "scripts")

import opencv_differential as diff  # noqa: E402

from tests.conftest import reference_data_available  # noqa: E402


def test_synthetic_agreement_50pct_outliers(rng):
    """Ours vs cv2-USAC on 16 identical synthetic pairs at 50%% outliers."""
    P, N = 16, 512
    x1, x2, Rg, tg = diff.make_pairs(rng, P, N, out_frac=0.5)
    res = jax.tree_util.tree_map(np.asarray, diff.ours_verify(x1, x2))

    agree_rot, agree_iou, ours_ok, cv_ok = [], [], [], []
    for p in range(P):
        ro = diff.rot_err_deg(res.i2Ri1[p], Rg[p])
        do = diff.dir_err_deg(res.i2Ui1[p], tg[p])
        ours_ok.append(bool(res.success[p]) and ro < 2 and do < 5)
        _, Rc, tc, inl_c = diff.cv2_verify(x1[p], x2[p])
        if Rc is None:
            continue
        cv_ok.append(diff.rot_err_deg(Rc, Rg[p]) < 2
                     and diff.dir_err_deg(tc, tg[p]) < 5)
        agree_rot.append(diff.rot_err_deg(res.i2Ri1[p], Rc))
        inl_o = res.inlier_mask[p] > 0
        agree_iou.append((inl_o & inl_c).sum() / max((inl_o | inl_c).sum(), 1))

    # Success parity: measured 100% for both at eps=0.5 (floor: 1 failure).
    assert np.mean(ours_ok) >= (P - 1) / P
    assert np.mean(cv_ok) >= 0.8  # the oracle itself can flake on a pair
    # Agreement with the oracle: measured med 0.19 deg / IoU 0.997.
    assert np.median(agree_rot) < 1.0
    assert np.median(agree_iou) > 0.9


def test_budget_matches_usac_confidence(rng):
    """At cv2's own effective sample count (p=0.999999 needs ~5.7k samples at
    eps=0.3) our fixed-budget kernel reaches USAC-grade success at 70%%
    outliers — measured 98%% vs cv2's 89-92%% (PERF.md r5)."""
    P, N = 16, 512
    x1, x2, Rg, tg = diff.make_pairs(rng, P, N, out_frac=0.7)
    res = jax.tree_util.tree_map(
        np.asarray, diff.ours_verify(x1, x2, budget=4096)
    )
    ok = [
        bool(res.success[p])
        and diff.rot_err_deg(res.i2Ri1[p], Rg[p]) < 2
        and diff.dir_err_deg(res.i2Ui1[p], tg[p]) < 5
        for p in range(P)
    ]
    assert np.mean(ok) >= 0.8


@pytest.mark.skipif(not reference_data_available(), reason="no reference data")
@pytest.mark.parametrize("pair", [(0, 1), (5, 6)])
def test_door_real_pair_agreement(pair):
    """Both verifiers on IDENTICAL real correspondences (door-12, our SIFT
    front-end): poses must agree with each other and with GT.

    Measured (PERF.md r5): R-agree <= 0.09 deg, dir-agree <= 0.57 deg,
    IoU >= 0.999 on all six probed pairs.
    """
    i, j = pair
    x1, x2, Rg, tg, fx = diff.door_correspondences(i, j)
    thr = 4.0 / fx
    res = jax.tree_util.tree_map(
        np.asarray, diff.ours_verify(x1[None], x2[None], threshold=thr)
    )
    _, Rc, tc, inl_c = diff.cv2_verify(x1, x2, threshold=thr)
    assert Rc is not None

    # vs GT (both engines)
    assert diff.rot_err_deg(res.i2Ri1[0], Rg) < 0.5
    assert diff.dir_err_deg(res.i2Ui1[0], tg) < 2.0
    assert diff.rot_err_deg(Rc, Rg) < 0.5
    assert diff.dir_err_deg(tc, tg) < 2.0

    # vs each other
    assert diff.rot_err_deg(res.i2Ri1[0], Rc) < 0.5
    assert diff.dir_err_deg(res.i2Ui1[0], tc) < 2.0
    inl_o = res.inlier_mask[0] > 0
    iou = (inl_o & inl_c).sum() / max((inl_o | inl_c).sum(), 1)
    assert iou > 0.95
