"""Epipolar geometry: E/F matrices, Sampson/SED distances, 8-point solver,
pose recovery from E with cheirality — all batched, static-shape JAX.

TPU-native replacement for the OpenCV calls the reference wraps:
  * cv2.findEssentialMat / findFundamentalMat (reference
    gtsfm/frontend/verifier/ransac.py:74,:103) -> :func:`essential_from_eight_point`
    inside the batched RANSAC engine (gtsfm_tpu/ops/ransac.py).
  * cv2.recoverPose (reference gtsfm/utils/verification.py:81)
    -> :func:`recover_pose_from_essential` (cheirality by batched midpoint
    triangulation over all 4 (R, t) candidates — no data-dependent branching).
  * E<->F conversions + Sampson/SED (reference gtsfm/utils/verification.py:97-214).

Conventions match the reference: E is defined so that for normalized coords
x1 (in image i1) and x2 (in image i2), ``x2^T E x1 = 0`` with
``E = [i2ti1]_x @ i2Ri1`` (i2Ei1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import lie


def homogenize(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def essential_from_pose(i2Ri1: jnp.ndarray, i2ti1: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R for relative pose i2Ti1 (t need not be unit)."""
    return lie.hat(i2ti1) @ i2Ri1


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """F = K2^-T E K1^-1 (reference utils/verification.py essential->fundamental)."""
    return jnp.linalg.inv(K2).swapaxes(-1, -2) @ E @ jnp.linalg.inv(K1)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """E = K2^T F K1 (reference utils/verification.py:97)."""
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


def sampson_distance_sq(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance (reference utils/verification.py:170).

    x1, x2: (..., N, 2) point coords (pixel for F, normalized for E).
    F: (..., 3, 3). Returns (..., N).
    """
    p1 = homogenize(x1)
    p2 = homogenize(x2)
    Fp1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftp2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    num = jnp.einsum("...ni,...ni->...n", p2, Fp1) ** 2
    den = Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2 + Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def symmetric_epipolar_distance_sq(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric epipolar distance (reference utils/verification.py:129)."""
    p1 = homogenize(x1)
    p2 = homogenize(x2)
    Fp1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftp2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    num = jnp.einsum("...ni,...ni->...n", p2, Fp1) ** 2
    d1 = jnp.maximum(Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2, 1e-12)
    d2 = jnp.maximum(Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2, 1e-12)
    return num * (1.0 / d1 + 1.0 / d2)


def _normalize_points(x: jnp.ndarray, w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization with weights w (soft mask): similarity T s.t.
    weighted centroid 0, weighted RMS distance sqrt(2). Returns (x_norm, T)."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    xc = x - mean
    rms = jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.sum(xc * xc, axis=-1) * w, axis=-1) / wsum[..., 0], 1e-12)
    )
    s = jnp.sqrt(2.0) / rms
    xn = xc * s[..., None, None]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, z, -s * mean[..., 0, 0]], axis=-1),
            jnp.stack([z, s, -s * mean[..., 0, 1]], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def fundamental_from_eight_point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted, normalized 8-point algorithm. Batched over leading dims.

    x1, x2: (..., N, 2) with N >= 8; w: (..., N) soft weights (0 masks a row).
    Returns F (..., 3, 3) with rank-2 constraint enforced. Solved via eigh of
    A^T A (9x9) — batched-friendly on TPU, no per-sample SVD of an Nx9.
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], x1.dtype)
    x1n, T1 = _normalize_points(x1, w)
    x2n, T2 = _normalize_points(x2, w)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    # Row per correspondence for x2^T F x1 = 0:
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (..., N, 9)
    A = A * w[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0]  # smallest eigenvalue eigenvector
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Rank-2 enforcement via SVD (3x3 — cheap, batched).
    U, S, Vt = jnp.linalg.svd(F)
    S2 = S.at[..., 2].set(0.0)
    F = (U * S2[..., None, :]) @ Vt
    # Denormalize: F = T2^T Fn T1.
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # Scale-normalize for stable thresholding.
    norm = jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-12)
    return F / norm


def essential_from_eight_point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """8-point on normalized (calibrated) coords, projected to the essential
    manifold (singular values -> (1, 1, 0))."""
    F = fundamental_from_eight_point(x1, x2, w)
    U, S, Vt = jnp.linalg.svd(F)
    S_ess = jnp.stack([jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]), jnp.zeros_like(S[..., 0])], axis=-1)
    return (U * S_ess[..., None, :]) @ Vt


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t) with ||t|| = 1.

    Returns (Rs, ts): (..., 4, 3, 3), (..., 4, 3). Candidates are
    (R1, +t), (R1, -t), (R2, +t), (R2, -t).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    detU = jnp.linalg.det(U)
    detVt = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(detU), jnp.ones_like(detU), detU], axis=-1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(detVt), jnp.ones_like(detVt), detVt], axis=-1)[..., :, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def _midpoint_depths(R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """Two-view midpoint triangulation depths for cheirality checks.

    Pose (R, t) = i2Ti1: maps i1-frame points into i2. Rays: d1 * f1 in frame 1,
    transformed ray in frame 2. Solves the 2x2 least-squares per correspondence,
    closed form, fully batched. Returns (z1, z2) depths in each camera frame.
    """
    f1 = homogenize(x1)
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = homogenize(x2)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    Rf1 = jnp.einsum("...ij,...nj->...ni", R, f1)
    # Solve min || z1 * Rf1 + t - z2 * f2 ||: normal equations 2x2.
    a = jnp.sum(Rf1 * Rf1, axis=-1)
    b = -jnp.sum(Rf1 * f2, axis=-1)
    c = jnp.sum(f2 * f2, axis=-1)
    rhs1 = -jnp.sum(Rf1 * t[..., None, :], axis=-1)
    rhs2 = jnp.sum(f2 * t[..., None, :], axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (c * rhs1 - b * rhs2) / det
    z2 = (a * rhs2 - b * rhs1) / det
    return z1, z2


def recover_pose_from_essential(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
):
    """Choose the (R, t) candidate with max points passing cheirality.

    Equivalent of cv2.recoverPose (reference utils/verification.py:52-95) but
    branch-free: evaluates all 4 candidates on all correspondences and argmaxes.
    Returns (i2Ri1, i2Ui1 (unit), num_in_front).
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], x1.dtype)
    Rs, ts = decompose_essential(E)  # (..., 4, 3, 3), (..., 4, 3)
    z1, z2 = _batched_depths(Rs, ts, x1, x2)  # (..., 4, N) each
    good = (z1 > 0.0) & (z2 > 0.0)
    counts = jnp.sum(good * w[..., None, :], axis=-1)  # (..., 4)
    best = jnp.argmax(counts, axis=-1)
    R = jnp.take_along_axis(Rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(ts, best[..., None, None], axis=-2)[..., 0, :]
    n = jnp.take_along_axis(counts, best[..., None], axis=-1)[..., 0]
    return R, t, n


def _batched_depths(Rs, ts, x1, x2):
    """Helper: depths for 4 candidates with arbitrary leading batch dims."""
    def per_candidate(k):
        return _midpoint_depths(Rs[..., k, :, :], ts[..., k, :], x1, x2)

    z1s, z2s = [], []
    for k in range(4):
        z1, z2 = per_candidate(k)
        z1s.append(z1)
        z2s.append(z2)
    return jnp.stack(z1s, axis=-2), jnp.stack(z2s, axis=-2)
