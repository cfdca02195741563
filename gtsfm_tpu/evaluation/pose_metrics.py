"""Pose accuracy metrics: angular errors + pose AUC + two-view reports.

Mirrors reference gtsfm/utils/metrics.py (:214 rotation/translation angle
metrics, :516 pose_auc, :340 compute_ba_pose_metrics) and
gtsfm/common/two_view_estimation_report.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from gtsfm_tpu.geometry import alignment, lie


@dataclasses.dataclass
class TwoViewEstimationReport:
    """Per-pair quality record (reference common/two_view_estimation_report.py)."""

    num_inliers_est_model: int
    inlier_ratio_est_model: float
    R_error_deg: float | None = None  # vs GT, if available
    U_error_deg: float | None = None
    num_matches: int = 0
    # GT-epipolar classification of the verified correspondences (reference
    # utils/metrics.py:99-131 compute_correspondence_metrics / Sampson): how
    # many of the matches the verifier kept are actually consistent with the
    # GT two-view geometry.
    num_inliers_gt_model: int | None = None
    inlier_ratio_gt_model: float | None = None
    gt_sampson_med_px: float | None = None


def two_view_reports_from_results(
    pairs, res, num_matches, wRi_gt=None, wti_gt=None, gt_valid=None
) -> dict[tuple[int, int], TwoViewEstimationReport]:
    """Build per-pair reports from the batched TwoViewResult (+GT if known)."""
    reports = {}
    for k, (a, b) in enumerate(pairs):
        rep = TwoViewEstimationReport(
            num_inliers_est_model=int(res.num_inliers[k]),
            inlier_ratio_est_model=float(res.inlier_ratio[k]),
            num_matches=int(num_matches[k]),
        )
        if (
            wRi_gt is not None and gt_valid is not None
            and gt_valid[a] > 0 and gt_valid[b] > 0
        ):
            aRb_gt = wRi_gt[b].T @ wRi_gt[a]  # i2Ri1 convention (a=i1, b=i2)
            rep.R_error_deg = float(
                jnp.degrees(
                    lie.rotation_angular_distance(
                        jnp.asarray(res.i2Ri1[k]), jnp.asarray(aRb_gt, jnp.float32)
                    )
                )
            )
            u_gt = wRi_gt[b].T @ (wti_gt[a] - wti_gt[b])
            norm = np.linalg.norm(u_gt)
            if norm > 1e-9:
                u_gt = u_gt / norm
                rep.U_error_deg = float(
                    np.degrees(
                        np.arccos(
                            np.clip(abs(float(jnp.dot(res.i2Ui1[k], jnp.asarray(u_gt, jnp.float32)))), -1, 1)
                        )
                    )
                )
        reports[(a, b)] = rep
    return reports


def save_two_view_reports(
    reports: "dict[tuple[int, int], TwoViewEstimationReport]", path: str
) -> None:
    """Serialize per-pair reports as JSON (reference
    save_full_frontend_metrics, scene_optimizer.py:418: one
    two_view_report_{TAG}.json per pipeline point, consumed by the
    dashboards)."""
    import dataclasses as _dc
    import json
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    for (i1, i2), rep in sorted(reports.items()):
        d = {"i1": int(i1), "i2": int(i2)}
        d.update(_dc.asdict(rep))
        rows.append(d)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


def pose_auc(errors_deg: np.ndarray, thresholds_deg=(1.0, 2.5, 5.0, 10.0)) -> dict[str, float]:
    """AUC of the pose-error CDF at the given thresholds
    (reference utils/metrics.py:516, the IMB/SuperGlue evaluation metric)."""
    errors = np.sort(np.asarray(errors_deg, np.float64))
    n = errors.shape[0]
    if n == 0:
        return {f"auc_{t}deg": 0.0 for t in thresholds_deg}
    recall = (np.arange(n) + 1) / n
    errors = np.concatenate([[0.0], errors])
    recall = np.concatenate([[0.0], recall])
    out = {}
    for t in thresholds_deg:
        last = np.searchsorted(errors, t)
        r = np.concatenate([recall[:last], [recall[min(last, n)]]])
        e = np.concatenate([errors[:last], [t]])
        out[f"auc_{t}deg"] = float(np.trapezoid(r, e) / t)
    return out


def compute_ba_pose_metrics(wRi_est, wti_est, wRi_gt, wti_gt, valid=None) -> dict:
    """Sim(3)-aligned per-camera errors + summary (reference
    utils/metrics.py:340 compute_ba_pose_metrics)."""
    (Ra, ta), _ = alignment.align_poses_sim3(
        jnp.asarray(wRi_est), jnp.asarray(wti_est),
        jnp.asarray(wRi_gt), jnp.asarray(wti_gt),
        valid=None if valid is None else jnp.asarray(valid),
    )
    rot = np.asarray(alignment.rotation_errors_deg(Ra, jnp.asarray(wRi_gt)))
    trans = np.linalg.norm(np.asarray(ta) - np.asarray(wti_gt), axis=-1)
    if valid is not None:
        sel = np.asarray(valid) > 0
        rot, trans = rot[sel], trans[sel]
    return {
        "rotation_errors_deg": rot,
        "translation_errors": trans,
        "rotation_auc": pose_auc(rot),
        "mean_rotation_error_deg": float(rot.mean()) if rot.size else float("nan"),
        "mean_translation_error": float(trans.mean()) if trans.size else float("nan"),
    }


def add_gt_correspondence_metrics(
    reports: "dict[tuple[int, int], TwoViewEstimationReport]",
    pairs,
    feats_uv,  # list of (K, 2) per-image keypoint arrays (np)
    match_idx,  # (P, K) matched index in image b per keypoint of a, -1 = none
    inlier_masks,  # (P, K_corr) verifier inlier mask rows (est model)
    cals,  # (N, 5) Cal3Bundler params
    wRi_gt, wti_gt, gt_valid,
    dist_threshold_px: float = 4.0,
) -> None:
    """Classify each pair's VERIFIED correspondences against the GT epipolar
    geometry (squared Sampson in pixels vs the GT fundamental matrix) and
    write the counts into the reports — reference
    utils/metrics.py:99-131 (compute_correspondence_metrics ->
    epipolar_inlier_correspondences), surfaced per pair in the
    TwoViewEstimationReport like the reference's frontend summaries.
    """
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import cameras as cam_mod
    from gtsfm_tpu.geometry import epipolar

    mi = np.asarray(match_idx)
    for k, (a, b) in enumerate(pairs):
        rep = reports.get((a, b))
        if rep is None or gt_valid is None or gt_valid[a] <= 0 or gt_valid[b] <= 0:
            continue
        ia = np.nonzero(mi[k] >= 0)[0]
        if ia.size == 0:
            continue
        ib = mi[k][ia]
        # Keep only the verifier's inliers. Correspondence rows keep the full
        # keypoint-of-a layout (matches_to_correspondences), so the inlier
        # mask is indexed by keypoint id; the image-correspondence (LoFTR)
        # path packs rows differently — its masks have a different length,
        # which the shape guard skips.
        im = np.asarray(inlier_masks[k])
        if im.shape[0] != np.asarray(feats_uv[a]).shape[0]:
            continue
        keep = im[ia] > 0
        ia, ib = ia[keep], ib[keep]
        if ia.size == 0:
            continue
        uv1 = np.asarray(feats_uv[a])[ia]
        uv2 = np.asarray(feats_uv[b])[ib]
        bRa = wRi_gt[b].T @ wRi_gt[a]
        bta = wRi_gt[b].T @ (wti_gt[a] - wti_gt[b])
        nrm = np.linalg.norm(bta)
        if nrm < 1e-9:
            continue  # zero-baseline GT: epipolar geometry undefined
        E = np.asarray(
            epipolar.essential_from_pose(
                jnp.asarray(bRa, jnp.float32), jnp.asarray(bta / nrm, jnp.float32)
            )
        )
        K1 = np.asarray(cam_mod.K_from_bundler(jnp.asarray(cals[a])))
        K2 = np.asarray(cam_mod.K_from_bundler(jnp.asarray(cals[b])))
        F = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)
        d2 = np.asarray(
            epipolar.sampson_distance_sq(
                jnp.asarray(F, jnp.float32), jnp.asarray(uv1, jnp.float32),
                jnp.asarray(uv2, jnp.float32),
            )
        )
        is_inl = d2 < dist_threshold_px**2
        rep.num_inliers_gt_model = int(is_inl.sum())
        rep.inlier_ratio_gt_model = float(is_inl.mean())
        rep.gt_sampson_med_px = float(np.sqrt(np.median(d2)))


def get_precision_recall_from_errors(
    inlier_errors, outlier_errors, max_inlier_error: float
):
    """Precision/recall of a partition judged against an error threshold
    (reference utils/metrics.py get_precision_recall_from_errors): an edge is
    TRULY good when its GT error is below max_inlier_error; the partition
    under test is (kept=inlier_errors, rejected=outlier_errors)."""
    inl = np.asarray([e for e in inlier_errors if e is not None], np.float64)
    out = np.asarray([e for e in outlier_errors if e is not None], np.float64)
    tp = float((inl < max_inlier_error).sum())
    fp = float((inl >= max_inlier_error).sum())
    fn = float((out < max_inlier_error).sum())
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    return precision, recall
