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
