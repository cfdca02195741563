"""Data association: RANSAC track triangulation with typed exit codes.

TPU-native replacement for the reference's Point3dInitializer +
DataAssociation (gtsfm/data_association/point3d_initializer.py:117,
data_assoc.py:42). The reference loops tracks in Python, batching them into
<= 1000 Dask tasks (data_assoc.py:39); here EVERY track triangulates in one
program, and RANSAC-over-measurement-pairs enumerates ALL pairs per track
(L*(L-1)/2 hypotheses, masked) instead of sampling — for SfM track lengths
(L <= ~30) exhaustive enumeration is cheaper than the reference's sampled
2749-hypothesis cap and strictly more accurate.

Exit codes mirror TriangulationExitCode (point3d_initializer.py:36):
SUCCESS / CHEIRALITY_FAILURE / EXCEEDS_REPROJ_THRESHOLD /
INSUFFICIENT_MEASUREMENTS / INSUFFICIENT_ANGLE.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import cameras, triangulation


class TriangulationExitCode(enum.IntEnum):
    SUCCESS = 0
    CHEIRALITY_FAILURE = 1
    INSUFFICIENT_MEASUREMENTS = 2
    EXCEEDS_REPROJ_THRESHOLD = 3
    INSUFFICIENT_ANGLE = 4


class TriangulationResult(NamedTuple):
    points: jnp.ndarray  # (T, 3)
    inlier_mask: jnp.ndarray  # (T, L) per-measurement inliers
    exit_codes: jnp.ndarray  # (T,) int32 TriangulationExitCode
    best_num_inliers: jnp.ndarray  # (T,)


@functools.partial(
    jax.jit, static_argnames=("reproj_thresh_px", "min_tri_angle_deg", "use_ransac")
)
def triangulate_tracks_robust(
    wRi: jnp.ndarray,  # (N, 3, 3) global camera rotations
    wti: jnp.ndarray,  # (N, 3)
    cal: jnp.ndarray,  # (N, 5)
    cam_idx: jnp.ndarray,  # (T, L) int32 per-measurement camera
    uv: jnp.ndarray,  # (T, L, 2)
    mask: jnp.ndarray,  # (T, L)
    reproj_thresh_px: float = 10.0,  # reference deep_front_end.yaml:84
    min_tri_angle_deg: float = 1.0,
    use_ransac: bool = True,
) -> TriangulationResult:
    T, L = cam_idx.shape
    K = jax.vmap(cameras.K_from_bundler)(cal)
    P_all = jax.vmap(triangulation.projection_matrix)(wRi, wti, K)  # (N, 3, 4)
    P_t = P_all[cam_idx]  # (T, L, 3, 4)
    wRi_t = wRi[cam_idx]
    wti_t = wti[cam_idx]
    cal_t = cal[cam_idx]

    def reproj_err(X):
        """X: (T, 3) -> per-measurement pixel error + depth (T, L)."""
        pred, depth = cameras.project_bundler(wRi_t, wti_t, cal_t, X[:, None, :])
        return jnp.linalg.norm(pred - uv, axis=-1), depth

    if use_ransac:
        # Enumerate all measurement pairs (i < j < L), masked.
        ii, jj = np.triu_indices(L, k=1)
        ii = jnp.asarray(ii)
        jj = jnp.asarray(jj)  # (H,)
        H = ii.shape[0]
        pair_valid = mask[:, ii] * mask[:, jj]  # (T, H)

        # Two-view DLT per hypothesis: mask all but rows ii/jj.
        hyp_mask = jnp.zeros((H, L)).at[jnp.arange(H), ii].set(1.0)
        hyp_mask = hyp_mask.at[jnp.arange(H), jj].set(1.0)  # (H, L)
        m_hyp = mask[:, None, :] * hyp_mask[None]  # (T, H, L)
        P_hyp = jnp.broadcast_to(P_t[:, None], (T, H, L, 3, 4))
        uv_hyp = jnp.broadcast_to(uv[:, None], (T, H, L, 2))
        X_hyp = triangulation.triangulate_tracks_dlt(
            P_hyp.reshape(T * H, L, 3, 4), uv_hyp.reshape(T * H, L, 2),
            m_hyp.reshape(T * H, L),
        ).reshape(T, H, 3)

        # Score each hypothesis against all measurements.
        pred, depth = cameras.project_bundler(
            wRi_t[:, None], wti_t[:, None], cal_t[:, None], X_hyp[:, :, None, :]
        )  # (T, H, L, 2)
        err_h = jnp.linalg.norm(pred - uv[:, None], axis=-1)
        inl_h = (err_h < reproj_thresh_px) & (depth > 0) & (mask[:, None, :] > 0)
        counts = jnp.sum(inl_h, axis=-1) * (pair_valid > 0)  # (T, H)
        best = jnp.argmax(counts, axis=-1)  # (T,)
        best_inl = jnp.take_along_axis(
            inl_h, best[:, None, None], axis=1
        )[:, 0].astype(uv.dtype)  # (T, L)
        best_count = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
        tri_mask = best_inl
    else:
        tri_mask = mask
        best_count = jnp.sum(mask, axis=-1)

    # Final DLT on the inlier set + GN refinement.
    X = triangulation.triangulate_tracks_dlt(P_t, uv, tri_mask)
    X = triangulation.refine_tracks_gn(wRi_t, wti_t, cal_t, uv, tri_mask, X, iters=5)

    err, depth = reproj_err(X)
    inlier = (err < reproj_thresh_px) & (depth > 0) & (mask > 0)
    inlier_f = inlier.astype(uv.dtype)
    n_inl = jnp.sum(inlier_f, axis=-1)

    # Triangulation angle on the inlier set.
    centers = wti_t
    angles = triangulation.triangulation_angles(centers, X, inlier_f)

    # Exit codes (priority order mirrors the reference's checks).
    n_meas = jnp.sum(mask, axis=-1)
    all_behind = jnp.sum((depth > 0) & (mask > 0), axis=-1) < 2
    code = jnp.full((T,), TriangulationExitCode.SUCCESS, jnp.int32)
    code = jnp.where(angles < min_tri_angle_deg, TriangulationExitCode.INSUFFICIENT_ANGLE, code)
    code = jnp.where(n_inl < 2, TriangulationExitCode.EXCEEDS_REPROJ_THRESHOLD, code)
    code = jnp.where(all_behind, TriangulationExitCode.CHEIRALITY_FAILURE, code)
    code = jnp.where(n_meas < 2, TriangulationExitCode.INSUFFICIENT_MEASUREMENTS, code)

    return TriangulationResult(
        points=X, inlier_mask=inlier_f, exit_codes=code, best_num_inliers=best_count
    )


def exit_code_histogram(codes: np.ndarray) -> dict[str, int]:
    """Per-code counts for metrics (reference data_assoc exit-code metrics)."""
    codes = np.asarray(codes)
    return {
        c.name.lower(): int(np.sum(codes == c.value)) for c in TriangulationExitCode
    }
