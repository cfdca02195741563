"""Hypothesis-parallel batched RANSAC for essential-matrix estimation.

TPU-native replacement for cv2.findEssentialMat USAC_ACCURATE + cv2.recoverPose
(reference gtsfm/frontend/verifier/ransac.py:51-110 and
gtsfm/utils/verification.py:52). The reference runs a data-dependent C++
RANSAC loop per pair on a Dask worker; here ALL pairs x ALL hypotheses are
evaluated in one fixed-shape XLA program (SURVEY.md section 7 "hard parts" #2):

  sample S minimal sets x P pairs -> batched 8-point (eigh of 9x9 normal
  matrices) -> Sampson scoring of N correspondences against S hypotheses on
  the MXU -> per-pair argmax -> local optimization (LO-RANSAC style weighted
  refits on the inlier set, matching pycolmap LORANSAC semantics at
  loransac.py:16) -> cheirality pose recovery.

Early exit is deliberately traded for fixed-budget parallelism: with S ~ 512
hypotheses the success probability at 50% inliers exceeds the reference's
0.999999 USAC setting (1 - (1 - 0.5^8)^512 ~ 0.87 per *single* round, and the
LO refit pulls in the full inlier set, so the effective budget matches).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import epipolar


class TwoViewResult(NamedTuple):
    """Per-pair verified geometry (all arrays lead with the pairs axis P)."""

    i2Ri1: jnp.ndarray  # (P, 3, 3)
    i2Ui1: jnp.ndarray  # (P, 3) unit translation direction
    inlier_mask: jnp.ndarray  # (P, N) float {0,1}
    num_inliers: jnp.ndarray  # (P,)
    inlier_ratio: jnp.ndarray  # (P,)
    success: jnp.ndarray  # (P,) bool — enough support to trust the model


def _sample_minimal_sets(key, mask, num_hypotheses: int, sample_size: int):
    """Sample indices of valid correspondences. mask: (N,). -> (S, k) int32.

    Uses Gumbel-top-k per hypothesis so indices within a set are distinct.
    """
    n = mask.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    scores = g + jnp.where(mask > 0, 0.0, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "lo_iterations")
)
def verify_essential_batched(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: jnp.ndarray,
    num_hypotheses: int = 512,
    lo_iterations: int = 2,
    min_inliers: int = 15,
    min_inlier_ratio: float = 0.1,
) -> TwoViewResult:
    """Verify P image pairs at once.

    Args:
      key: PRNG key.
      x1, x2: (P, N, 2) NORMALIZED (calibrated) correspondences, padded.
      mask: (P, N) 1.0 for real correspondences.
      threshold: per-pair Sampson threshold in normalized coords — typically
        ``px_thresh / focal_mean`` (reference uses 4 px / f). Scalar or (P,).
      num_hypotheses: hypothesis budget S per pair.
      lo_iterations: inner weighted-refit (local optimization) rounds.
      min_inliers / min_inlier_ratio: the reference's InlierSupportProcessor
        gates (frontend/inlier_support_processor.py:19 — 15 / 0.1).
    """
    P, N, _ = x1.shape
    threshold = jnp.broadcast_to(jnp.asarray(threshold, x1.dtype), (P,))
    thresh_sq = threshold**2

    # Hypothesis budget: 3/4 from 8-point minimal samples + 1/4 from
    # homography decompositions (each 4-point H sample yields 2 E candidates).
    # The H-derived pool is what keeps low-parallax / near-planar pairs
    # solvable: coplanar points are RANK-DEFICIENT for the linear 8-point
    # system, so its minimal samples almost never produce an accurate E on
    # shallow scenes (aerial surveys), while a 4-point H fit is
    # well-conditioned there and decomposes to the true relative pose
    # (epipolar.essentials_from_homography). The reference inherits this
    # robustness from the planar-safe 5-point solver inside
    # cv2.findEssentialMat (ransac.py:74); this is the fixed-shape batched
    # counterpart.
    S8 = (3 * num_hypotheses) // 4
    SH = max((num_hypotheses - S8) // 2, 1)

    keys = jax.random.split(key, 2 * P).reshape(2, P, -1)
    sample_idx = jax.vmap(
        lambda k, m: _sample_minimal_sets(k, m, S8, 8)
    )(keys[0], mask)  # (P, S8, 8)
    sample_idx4 = jax.vmap(
        lambda k, m: _sample_minimal_sets(k, m, SH, 4)
    )(keys[1], mask)  # (P, SH, 4)

    def take(pts, idx):
        return jnp.take_along_axis(
            pts[:, None, :, :].repeat(idx.shape[1], axis=1), idx[..., None], axis=2
        )

    # 8-point hypotheses: (P, S8, 3, 3)
    E_8 = epipolar.essential_from_eight_point(
        take(x1, sample_idx), take(x2, sample_idx)
    )
    # Homography-decomposition hypotheses: (P, SH, 2, 3, 3) -> (P, 2*SH, 3, 3)
    from gtsfm_tpu.ops.verifiers import homography_from_four_point

    H_h = homography_from_four_point(take(x1, sample_idx4), take(x2, sample_idx4))
    E_H = epipolar.essentials_from_homography(H_h).reshape(P, 2 * SH, 3, 3)
    E_h = jnp.concatenate([E_8, E_H], axis=1)  # (P, S, 3, 3)

    def msac_score(d, m):
        """Truncated-residual (MSAC) score, higher = better. Count-based
        scoring cannot separate two models that tie on support (planar
        two-fold ambiguity: the wrong branch can hold every inlier at the
        threshold); the residual-mass term always prefers the tighter fit —
        matching the reference's USAC_ACCURATE behavior (ransac.py:74)."""
        t_sq = thresh_sq.reshape((P,) + (1,) * (d.ndim - 1))
        return jnp.sum(jnp.maximum(1.0 - d / t_sq, 0.0) * m, axis=-1)

    # Score every correspondence against every hypothesis: (P, S, N)
    d = epipolar.sampson_distance_sq(E_h, x1[:, None], x2[:, None])
    d = jnp.where(jnp.isfinite(d), d, jnp.inf)
    inl = (d < thresh_sq[:, None, None]) & (mask[:, None, :] > 0)
    scores = msac_score(d, mask[:, None, :])  # (P, S)
    best = jnp.argmax(scores, axis=-1)  # (P,)

    w_best = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0].astype(x1.dtype)
    E_best = jnp.take_along_axis(E_h, best[:, None, None, None], axis=1)[:, 0]
    s_best = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]

    # Local optimization: refit on the current inlier set, keep whichever model
    # scores best overall (the best hypothesis E is a candidate throughout).
    def lo_step(carry, _):
        E_b, w_b, s_b, w_cur = carry
        E = epipolar.essential_from_eight_point(x1, x2, w_cur)
        d = epipolar.sampson_distance_sq(E, x1, x2)
        d = jnp.where(jnp.isfinite(d), d, jnp.inf)
        w_new = ((d < thresh_sq[:, None]) & (mask > 0)).astype(x1.dtype)
        s_new = msac_score(d, mask)
        better = s_new > s_b
        E_b = jnp.where(better[:, None, None], E, E_b)
        w_b = jnp.where(better[:, None], w_new, w_b)
        s_b = jnp.where(better, s_new, s_b)
        return (E_b, w_b, s_b, w_new), None

    (E_sel, w_sel, s_sel, _), _ = jax.lax.scan(
        lo_step, (E_best, w_best, s_best, w_best), None, length=lo_iterations
    )

    # Final polish: refit on the selected consensus set (all inliers beat any
    # minimal sample for accuracy). Accept only if the MSAC score holds up.
    E_pol = epipolar.essential_from_eight_point(x1, x2, w_sel)
    d_pol = epipolar.sampson_distance_sq(E_pol, x1, x2)
    d_pol = jnp.where(jnp.isfinite(d_pol), d_pol, jnp.inf)
    w_pol = ((d_pol < thresh_sq[:, None]) & (mask > 0)).astype(x1.dtype)
    ok_pol = msac_score(d_pol, mask) >= s_sel
    E_final = jnp.where(ok_pol[:, None, None], E_pol, E_sel)
    inlier_mask = jnp.where(ok_pol[:, None], w_pol, w_sel)

    R, U, _ = epipolar.recover_pose_from_essential(E_final, x1, x2, inlier_mask)

    num_inl = jnp.sum(inlier_mask, axis=-1)
    n_corr = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    ratio = num_inl / n_corr
    success = (num_inl >= min_inliers) & (ratio >= min_inlier_ratio)
    return TwoViewResult(
        i2Ri1=R,
        i2Ui1=U / jnp.maximum(jnp.linalg.norm(U, axis=-1, keepdims=True), 1e-12),
        inlier_mask=inlier_mask,
        num_inliers=num_inl,
        inlier_ratio=ratio,
        success=success,
    )
