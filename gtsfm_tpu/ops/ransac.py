"""Hypothesis-parallel batched RANSAC for essential-matrix estimation.

TPU-native replacement for cv2.findEssentialMat USAC_ACCURATE + cv2.recoverPose
(reference gtsfm/frontend/verifier/ransac.py:51-110 and
gtsfm/utils/verification.py:52). The reference runs a data-dependent C++
RANSAC loop per pair on a Dask worker; here ALL pairs x ALL hypotheses are
evaluated in one fixed-shape XLA program (SURVEY.md section 7 "hard parts" #2):

  1. HYPOTHESES — three-quarters of the minimal-sample budget goes to
     5-point samples solved by the batched Nistér polynomial solver
     (geometry/fivepoint.py, up to 10 essential matrices per sample: the
     same minimal solver cv2's USAC runs, so the per-sample success rate is
     eps^5 at inlier ratio eps, not the eps^8 of a linear 8-point sample);
     the rest goes to 4-point homography samples decomposed into E
     candidates (Faugeras-Lustman), which keep near-planar/low-parallax
     pairs well-served even when noise degrades the polynomial solve.
  2. PRE-GATE — the pool (10 candidates per 5-pt sample) is scored in
     bfloat16 on a fixed random subsample of correspondences via one MXU
     matmul (Sampson distance as 5 linear functionals of vec(E)); the top
     `max_scored` candidates per pair move on. This is what makes a
     USAC-grade sample budget affordable: full-resolution scoring bytes are
     independent of the pool size.
  3. FULL SCORE — survivors are scored in f32 on every correspondence
     (same MXU formulation), MSAC-truncated; per-pair argmax.
  4. LO + POLISH — LO-RANSAC weighted 8-point refits on the running inlier
     set (matching pycolmap LORANSAC semantics, loransac.py:16), final
     consensus refit, cheirality pose recovery.

Early exit is traded for fixed-budget parallelism: with the default budget
(384 five-point samples) the success probability at 50% inliers is
1 - (1 - 0.5^5)^384 = 1 - 5e-6, matching the reference's 0.999999 USAC
confidence setting; see PERF.md for the measured success-vs-outlier-ratio
curve against the 8-point variant.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import epipolar, fivepoint


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

    ONE random permutation of the valid indices (argsort of uniform keys,
    invalid keyed last) + per-hypothesis (offset, stride) probes into it:
    positions off + j*stride (j < k, stride < n_valid/k) are distinct mod
    n_valid, and a uniformly random permutation maps ANY fixed position set
    to a uniformly random index subset — so every hypothesis still draws a
    uniform random distinct k-subset of the valid correspondences. Replaces
    r4's per-hypothesis Gumbel-top-k, whose (S, N) top_k lowered to a FULL
    per-row sort on TPU (6.3 of the 86 ms composite kernel at 64x1024 was
    sorting Gumbel noise; the per-pair permutation sort is 1/S that size).
    """
    n = mask.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    # G independent permutations, hypotheses striped across them: a SINGLE
    # shared permutation correlates the hypotheses' subsets enough to cost
    # measurable success at 60-70% outliers (91% vs 100% at eps=0.4 in the
    # sweep); 8 permutations restore independence to within noise while the
    # sort stays 1/(S/8) the size of the r4 per-hypothesis Gumbel top-k.
    G = min(32, num_hypotheses)
    keys = jax.random.uniform(k1, (G, n)) + jnp.where(mask > 0, 0.0, 2.0)
    perms = jnp.argsort(keys, axis=-1)  # (G, n) valid first, shuffled
    nv = jnp.maximum(jnp.sum(mask > 0).astype(jnp.int32), sample_size)
    off = jax.random.randint(k2, (num_hypotheses, 1), 0, 1 << 30) % nv
    max_stride = jnp.maximum(nv // sample_size, 1)
    stride = 1 + jax.random.randint(
        k3, (num_hypotheses, 1), 0, 1 << 30
    ) % max_stride
    pos = (off + stride * jnp.arange(sample_size)[None, :]) % nv
    g = (jnp.arange(num_hypotheses) % G)[:, None]
    return perms.reshape(-1)[g * n + pos]


def _sampson_sq_mxu(E_flat: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Squared Sampson distances for many models x many points, MXU-routed.

    The Sampson distance depends on vec(E) through 5 linear functionals per
    correspondence: x2h^T E x1h (numerator) and the first two components of
    E x1h and E^T x2h (denominator). Stacking their coefficient rows gives
    ONE (P, 5N, 9) @ (P, 9, S) matmul instead of the (P, S, N, 3) einsum
    chains that made the r3 kernel byte-bound at 5-8%% of roofline
    (PERF.md roofline table; VERDICT r3 item 3).

    E_flat: (P, S, 9) row-major vec(E); x1, x2: (P, N, 2).
    Returns (P, S, N) squared Sampson distances in float32.
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    o = jnp.ones_like(u1)
    z = jnp.zeros_like(u1)
    C = jnp.stack(
        [
            jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1),
            jnp.stack([u1, v1, o, z, z, z, z, z, z], -1),
            jnp.stack([z, z, z, u1, v1, o, z, z, z], -1),
            jnp.stack([u2, z, z, v2, z, z, o, z, z], -1),
            jnp.stack([z, u2, z, z, v2, z, z, o, z], -1),
        ],
        axis=-2,
    )  # (P, N, 5, 9)
    P, N = u1.shape
    G = jnp.einsum(
        "pnk,psk->pns",
        C.reshape(P, N * 5, 9).astype(dtype),
        E_flat.astype(dtype),
        preferred_element_type=jnp.float32,
    )  # (P, 5N, S)
    G = G.reshape(P, N, 5, -1)
    num = G[:, :, 0] ** 2
    den = G[:, :, 1] ** 2 + G[:, :, 2] ** 2 + G[:, :, 3] ** 2 + G[:, :, 4] ** 2
    d = num / jnp.maximum(den, 1e-12)
    return jnp.swapaxes(d, 1, 2)  # (P, S, N)


@functools.partial(
    jax.jit,
    static_argnames=("num_hypotheses", "lo_iterations", "prescreen_corrs",
                     "max_scored", "minimal_solver"),
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
    prescreen_corrs: int = 256,
    max_scored: int = 512,
    minimal_solver: str = "nister5",
) -> TwoViewResult:
    """Verify P image pairs at once.

    Args:
      key: PRNG key.
      x1, x2: (P, N, 2) NORMALIZED (calibrated) correspondences, padded.
      mask: (P, N) 1.0 for real correspondences.
      threshold: per-pair Sampson threshold in normalized coords — typically
        ``px_thresh / focal_mean`` (reference uses 4 px / f). Scalar or (P,).
      num_hypotheses: minimal-SAMPLE budget per pair (3/4 five-point +
        1/8 four-point-homography; each 5-pt sample contributes up to 10
        essential candidates, each H sample 2).
      lo_iterations: inner weighted-refit (local optimization) rounds.
      min_inliers / min_inlier_ratio: the reference's InlierSupportProcessor
        gates (frontend/inlier_support_processor.py:19 — 15 / 0.1).
      prescreen_corrs: correspondence subsample size for the bf16 pre-gate.
      max_scored: candidates per pair that survive to full f32 scoring.
      minimal_solver: "nister5" (default; USAC-grade eps^5 sampling) or
        "eight" (legacy linear 8-point sampling, kept for the measured
        robustness A/B in PERF.md — eps^8 per-sample success).
    """
    P, N, _ = x1.shape
    threshold = jnp.broadcast_to(jnp.asarray(threshold, x1.dtype), (P,))
    thresh_sq = threshold**2

    S5 = max((3 * num_hypotheses) // 4, 1)
    SH = max(num_hypotheses // 8, 1)

    keys = jax.random.split(key, 3 * P).reshape(3, P, -1)
    idx4 = jax.vmap(lambda k, m: _sample_minimal_sets(k, m, SH, 4))(keys[1], mask)

    def take(pts, idx):
        # (P, N, 2) gathered at (P, S, k) -> (P, S, k, 2). vmap'd fancy
        # indexing — take_along_axis would need the (P, S, N, 2) repeat
        # materialized (hundreds of MB at production sizes).
        return jax.vmap(lambda p, i: p[i])(pts, idx)

    if minimal_solver == "nister5":
        # Nistér 5-point hypotheses: (P, S5, 10, 3, 3) -> (P, 10*S5, 3, 3).
        idx5 = jax.vmap(lambda k, m: _sample_minimal_sets(k, m, S5, 5))(keys[0], mask)
        E_5, valid_5 = fivepoint.essential_from_five_point(
            take(x1, idx5), take(x2, idx5)
        )
        E_5 = E_5.reshape(P, 10 * S5, 3, 3)
        valid_5 = valid_5.reshape(P, 10 * S5)
    elif minimal_solver == "eight":
        idx8 = jax.vmap(lambda k, m: _sample_minimal_sets(k, m, S5, 8))(keys[0], mask)
        E_5 = epipolar.essential_from_eight_point(take(x1, idx8), take(x2, idx8))
        valid_5 = jnp.ones((P, S5), bool)
    else:
        raise ValueError(f"unknown minimal_solver {minimal_solver!r}")

    # Homography-decomposition hypotheses: 2 per 4-point sample. Kept beside
    # the 5-point pool: when pixel noise degrades the polynomial solve on
    # low-parallax pairs, a 4-point H fit stays well-conditioned and its
    # Faugeras-Lustman decomposition still lands near the true pose.
    from gtsfm_tpu.ops.verifiers import homography_from_four_point

    H_h = homography_from_four_point(take(x1, idx4), take(x2, idx4))
    E_H = epipolar.essentials_from_homography(H_h).reshape(P, 2 * SH, 3, 3)

    E_pool = jnp.concatenate([E_5, E_H], axis=1)  # (P, S_pool, 3, 3)
    valid_pool = jnp.concatenate(
        [valid_5, jnp.ones((P, 2 * SH), bool)], axis=1
    )
    S_pool = E_pool.shape[1]
    E_pool_flat = E_pool.reshape(P, S_pool, 9)
    # Kill (near-)zero candidates: a degenerate homography decomposition
    # (d1 ~ d3 -> t = 0) yields E = 0 EXACTLY, and the scale-invariant
    # Sampson ratio scores zero-E as a perfect all-inlier model
    # (0 / max(0, eps) = 0 for every correspondence) — it must never reach
    # the argmax. Proper candidates are ~unit Frobenius norm.
    valid_pool = valid_pool & (
        jnp.linalg.norm(E_pool_flat, axis=-1) > 1e-5
    )

    def msac_score(d, m):
        """Truncated-residual (MSAC) score, higher = better. Count-based
        scoring cannot separate two models that tie on support (planar
        two-fold ambiguity: the wrong branch can hold every inlier at the
        threshold); the residual-mass term always prefers the tighter fit —
        matching the reference's USAC_ACCURATE behavior (ransac.py:74)."""
        t_sq = thresh_sq.reshape((P,) + (1,) * (d.ndim - 1))
        return jnp.sum(jnp.maximum(1.0 - d / t_sq, 0.0) * m, axis=-1)

    def msac_scores_tiled(E_flat, xa, xb, m, dtype, tile):
        """MSAC scores for every candidate, hypothesis axis processed in
        `tile`-sized lax.scan steps. Peak memory is O(P * 5N * tile)
        instead of O(P * 5N * S): at production chunk sizes (512 pairs x
        2048 corrs x 3968-candidate pool) the one-shot matmul's (P, 5N, S)
        output alone is ~10 GB and OOMs the chip (r4 large-scene bench)."""
        S = E_flat.shape[1]
        pad = (-S) % tile
        Ef = jnp.pad(E_flat, ((0, 0), (0, pad), (0, 0)))
        Ef = jnp.swapaxes(Ef.reshape(P, -1, tile, 9), 0, 1)  # (nt, P, tile, 9)

        def step(_, Et):
            d = _sampson_sq_mxu(Et, xa, xb, dtype=dtype)  # (P, tile, N)
            d = jnp.where(jnp.isfinite(d), d, jnp.inf)
            return None, msac_score(d, m[:, None, :])

        _, sc = jax.lax.scan(step, None, Ef)  # (nt, P, tile)
        return jnp.moveaxis(sc, 0, 1).reshape(P, -1)[:, :S]

    # --- Pre-gate: rank the pool on a correspondence subsample in bf16.
    K = min(max_scored, S_pool)
    if S_pool > K:
        M_sub = min(prescreen_corrs, N)
        sub_idx = jax.vmap(
            lambda k, m: _sample_minimal_sets(k, m, 1, M_sub)[0]
        )(keys[2], mask)  # (P, M_sub) distinct, valid-first
        take_n = lambda a: jnp.take_along_axis(a, sub_idx, axis=1)
        x1_s = jnp.take_along_axis(x1, sub_idx[..., None], axis=1)
        x2_s = jnp.take_along_axis(x2, sub_idx[..., None], axis=1)
        mask_s = take_n(mask)
        pre = msac_scores_tiled(
            E_pool_flat, x1_s, x2_s, mask_s, jnp.bfloat16, tile=512
        )
        pre = jnp.where(valid_pool, pre, -jnp.inf)
        _, top_idx = jax.lax.top_k(pre, K)  # (P, K)
        E_h = jnp.take_along_axis(E_pool, top_idx[..., None, None], axis=1)
        valid_h = jnp.take_along_axis(valid_pool, top_idx, axis=1)
    else:
        E_h = E_pool
        valid_h = valid_pool

    # --- Full f32 scoring of the survivors on every correspondence.
    scores = msac_scores_tiled(
        E_h.reshape(P, K, 9), x1, x2, mask, jnp.float32, tile=64
    )  # (P, K)
    scores = jnp.where(valid_h, scores, -jnp.inf)
    best = jnp.argmax(scores, axis=-1)  # (P,)

    E_best = jnp.take_along_axis(E_h, best[:, None, None, None], axis=1)[:, 0]
    s_best = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    # Winner's inlier mask: one extra single-candidate scoring pass instead
    # of materializing the (P, K, N) distance/inlier tensors. Uses the SAME
    # MXU Sampson kernel (f32) as the full-score pass so threshold-boundary
    # classification is consistent with the score that selected E_best
    # (advisor r4: the plain sampson_distance_sq path could round
    # differently under fusion).
    d_best = _sampson_sq_mxu(
        E_best.reshape(P, 1, 9), x1, x2, dtype=jnp.float32
    )[:, 0]
    d_best = jnp.where(jnp.isfinite(d_best), d_best, jnp.inf)
    w_best = ((d_best < thresh_sq[:, None]) & (mask > 0)).astype(x1.dtype)

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
