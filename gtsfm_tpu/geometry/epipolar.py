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
import numpy as np

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


def _chol9_unrolled(M: jnp.ndarray, eps: jnp.ndarray) -> list:
    """Batched unrolled Cholesky of (M + eps I), n = 9.

    Returns the lower factor as a python list-of-lists of batched scalars.
    Fully elementwise: batched lax Cholesky on millions of tiny matrices
    lowers to a blocked iterative algorithm orders of magnitude slower."""
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j] + (eps if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol9_solve(L: list, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b with the unrolled factor; b (..., 9)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _smallest_eigvec_sym9(M: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of batched 9x9 PSD matrices via
    inverse iteration with a tiny shift (unrolled batched Cholesky solves)."""
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    L = _chol9_unrolled(M, 1e-7 * tr + 1e-12)
    v = jnp.ones(M.shape[:-2] + (9,), M.dtype)
    v = v.at[..., 0].set(1.31).at[..., 4].set(0.47).at[..., 8].set(0.83)
    for _ in range(iters):
        v = _chol9_solve(L, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _smallest_eigvec_sym3(A: jnp.ndarray, polish_iters: int = 8) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of batched symmetric PSD 3x3 matrices:
    adjugate column (exact for rank-2) + shifted power-iteration polish."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    # Cofactor matrix of the symmetric A (equals its adjugate).
    C00 = d * f - e * e
    C01 = c * e - b * f
    C02 = b * e - c * d
    C11 = a * f - c * c
    C12 = b * c - a * e
    C22 = a * d - b * b
    adj = jnp.stack(
        [
            jnp.stack([C00, C01, C02], -1),
            jnp.stack([C01, C11, C12], -1),
            jnp.stack([C02, C12, C22], -1),
        ],
        -2,
    )
    norms = jnp.linalg.norm(adj, axis=-2)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(adj, col[..., None, None], axis=-1)[..., 0]
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.where(nv > 1e-30, v / jnp.maximum(nv, 1e-30),
                  jnp.asarray([0.27, 0.53, 0.80], A.dtype))
    sigma = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    S = sigma * jnp.eye(3, dtype=A.dtype) - A

    def body(v, _):
        w = jnp.einsum("...ij,...j->...i", S, v)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-30), None

    v, _ = jax.lax.scan(body, v, None, length=polish_iters)
    return v


def _invsqrt_spd3(G: jnp.ndarray, iters: int = 14) -> jnp.ndarray:
    """Batched G^{-1/2} for SPD 3x3 via scaled Newton-Schulz (matmul-only)."""
    tr = jnp.trace(G, axis1=-2, axis2=-1)[..., None, None]
    c = jnp.maximum(tr, 1e-20)
    Y = G / c  # spectrum in (0, 1]
    I = jnp.eye(3, dtype=G.dtype)
    # Derive Z from Y (not a fresh constant) so that inside shard_map the
    # scan carry has the same varying-manual-axes type as its output.
    Z = I + 0.0 * Y

    def body(carry, _):
        Y, Z = carry
        T = 0.5 * (3.0 * I - Z @ Y)
        return (Y @ T, T @ Z), None

    (Y, Z), _ = jax.lax.scan(body, (Y, Z), None, length=iters)
    # Z -> (G/c)^{-1/2}; scale back.
    return Z / jnp.sqrt(c)


def _eigvec_for(G: jnp.ndarray, lam: jnp.ndarray, fallback: jnp.ndarray):
    """Eigenvector of symmetric 3x3 G for eigenvalue lam via the adjugate of
    (G - lam I) (rank-2 -> adjugate = c v v^T). fallback: (3,) probe used
    when the adjugate vanishes (repeated eigenvalue)."""
    M = G - lam[..., None, None] * jnp.eye(3, dtype=G.dtype)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e = M[..., 1, 1], M[..., 1, 2]
    f = M[..., 2, 2]
    adj = jnp.stack(
        [
            jnp.stack([d * f - e * e, c * e - b * f, b * e - c * d], -1),
            jnp.stack([c * e - b * f, a * f - c * c, b * c - a * e], -1),
            jnp.stack([b * e - c * d, b * c - a * e, a * d - b * b], -1),
        ],
        -2,
    )
    norms = jnp.linalg.norm(adj, axis=-2)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(adj, col[..., None, None], axis=-1)[..., 0]
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    scale = jnp.maximum(jnp.linalg.norm(G, axis=(-2, -1), keepdims=True), 1e-30)
    ok = nv > 1e-12 * scale[..., 0]
    v = jnp.where(ok, v / jnp.maximum(nv, 1e-30),
                  fallback / jnp.linalg.norm(fallback))
    return v


def _svd3x3(H: jnp.ndarray):
    """Closed-form batched SVD of 3x3 matrices: (U, S, Vt), S descending.

    jnp.linalg.svd serializes on TPU (one LAPACK-style iteration per batch
    element); here the symmetric eigenproblem of H^T H is solved with the
    trigonometric (Cardano) eigenvalue formula + adjugate eigenvectors,
    then U = H V / S with a cross-product completion for the smallest
    singular direction. Accuracy is a few ulp worse than LAPACK near
    repeated singular values — the homography-decomposition consumer treats
    those as degenerate anyway."""
    G = jnp.swapaxes(H, -1, -2) @ H
    q = jnp.trace(G, axis1=-2, axis2=-1) / 3.0
    B = G - q[..., None, None] * jnp.eye(3, dtype=G.dtype)
    p = jnp.sqrt(jnp.maximum(jnp.trace(B @ B, axis1=-2, axis2=-1) / 6.0, 1e-30))
    r = jnp.clip(
        jnp.linalg.det(B / p[..., None, None]) / 2.0, -1.0, 1.0
    )
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3
    fb1 = jnp.asarray([0.27, 0.53, 0.80], G.dtype)
    v1 = _eigvec_for(G, lam1, fb1)
    v3 = _eigvec_for(G, lam3, jnp.asarray([0.80, -0.27, 0.53], G.dtype))
    # Polish: two power-iteration steps sharpen v1 (dominant) and v3 (via
    # the complement tr(G)I - G) — the adjugate construction alone loses a
    # few bits near close singular values, which measurably costs RANSAC
    # success in the 50-60%-outlier regime.
    tr3 = jnp.trace(G, axis1=-2, axis2=-1)[..., None]
    for _ in range(2):
        # Keep the pre-polish vector when the matvec collapses (G ~ 0 or
        # the complement annihilates v3) — a zero iterate would otherwise
        # wipe the probe fallback (advisor r4 rank-deficiency fix).
        v1n = jnp.einsum("...ij,...j->...i", G, v1)
        m1 = jnp.linalg.norm(v1n, axis=-1, keepdims=True)
        v1 = jnp.where(m1 > 1e-20, v1n / jnp.maximum(m1, 1e-30), v1)
        v3n = tr3 * v3 - jnp.einsum("...ij,...j->...i", G, v3)
        m3 = jnp.linalg.norm(v3n, axis=-1, keepdims=True)
        v3 = jnp.where(m3 > 1e-20, v3n / jnp.maximum(m3, 1e-30), v3)
    # Orthonormalize: v3 against v1, v2 completes the right-handed frame.
    v3 = v3 - jnp.sum(v3 * v1, axis=-1, keepdims=True) * v1
    nv3 = jnp.linalg.norm(v3, axis=-1, keepdims=True)
    v3 = jnp.where(nv3 > 1e-12, v3 / jnp.maximum(nv3, 1e-30),
                   jnp.cross(v1, fb1) /
                   jnp.maximum(jnp.linalg.norm(jnp.cross(v1, fb1), axis=-1,
                                               keepdims=True), 1e-30))
    v2 = jnp.cross(v3, v1)
    V = jnp.stack([v1, v2, v3], axis=-1)  # columns
    S = jnp.sqrt(jnp.maximum(jnp.stack([lam1, lam2, lam3], axis=-1), 0.0))
    HV = H @ V
    u1 = HV[..., :, 0] / jnp.maximum(S[..., 0, None], 1e-20)
    u2 = HV[..., :, 1] / jnp.maximum(S[..., 1, None], 1e-20)
    # Re-orthonormalize the first two (f32 drift), complete with the cross.
    # Rank-deficient fallbacks (advisor r4): for rank<=1 H the u2 column
    # (and for H ~ 0 even u1) collapses to ~0 before normalization; fall
    # back to probe-vector completions so U stays orthonormal always.
    nu1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u1 = jnp.where(
        nu1 > 1e-12,
        u1 / jnp.maximum(nu1, 1e-30),
        jnp.broadcast_to(fb1 / jnp.linalg.norm(fb1), u1.shape),
    )
    u2 = u2 - jnp.sum(u2 * u1, axis=-1, keepdims=True) * u1
    nu2 = jnp.linalg.norm(u2, axis=-1, keepdims=True)
    # Probe for the fallback: whichever of two fixed vectors is less
    # aligned with u1 (a single probe can be parallel to u1 — e.g. the
    # H = 0 case where u1 IS the probe).
    fb2 = jnp.asarray([0.80, -0.27, 0.53], G.dtype)
    probe = jnp.where(
        jnp.abs(jnp.sum(u1 * fb1, axis=-1, keepdims=True)) < 0.9,
        jnp.broadcast_to(fb1, u1.shape),
        jnp.broadcast_to(fb2, u1.shape),
    )
    u2_fb = jnp.cross(u1, probe)
    u2_fb = u2_fb / jnp.maximum(
        jnp.linalg.norm(u2_fb, axis=-1, keepdims=True), 1e-30
    )
    u2 = jnp.where(nu2 > 1e-12, u2 / jnp.maximum(nu2, 1e-30), u2_fb)
    # Third left-singular direction: the cross completes the orthonormal
    # frame, but its SIGN must follow H v3 (for det(H) < 0 the true u3 is
    # the left-handed completion; forcing right-handedness breaks
    # H = U S V^T on half of all inputs). s3 ~ 0 -> either sign is fine.
    u3c = jnp.cross(u1, u2)
    sgn = jnp.where(
        jnp.sum(HV[..., :, 2] * u3c, axis=-1, keepdims=True) < 0.0, -1.0, 1.0
    )
    u3 = u3c * sgn
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


def _rank2_project(F: jnp.ndarray) -> jnp.ndarray:
    """Nearest rank-2 matrix (zero the smallest singular value) without SVD:
    F - (F v3) v3^T with v3 the smallest right-singular vector."""
    v3 = _smallest_eigvec_sym3(jnp.swapaxes(F, -1, -2) @ F)
    Fv3 = jnp.einsum("...ij,...j->...i", F, v3)
    return F - Fv3[..., :, None] * v3[..., None, :]


def fundamental_from_eight_point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted, normalized 8-point algorithm. Batched over leading dims.

    x1, x2: (..., N, 2) with N >= 8; w: (..., N) soft weights (0 masks a row).
    Returns F (..., 3, 3) with rank-2 constraint enforced. The 9x9 normal
    system's smallest eigenvector comes from unrolled-Cholesky inverse
    iteration and the rank-2 projection is SVD-free — batched jnp.linalg
    eigh/svd on millions of tiny matrices serialize on TPU.
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
    f = _smallest_eigvec_sym9(AtA)
    F = f.reshape(f.shape[:-1] + (3, 3))
    F = _rank2_project(F)
    # Denormalize: F = T2^T Fn T1.
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # Scale-normalize for stable thresholding.
    norm = jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-12)
    return F / norm


def essential_from_eight_point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """8-point on normalized (calibrated) coords, projected to the essential
    manifold (singular values -> (1, 1, 0)).

    SVD-free projection: with v3 the smallest right-singular vector of F and
    B = F (I - v3 v3^T), E = B (B^T B + v3 v3^T)^{-1/2} = U diag(1,1,0) V^T
    (the inverse square root rescales the two live singular values to 1 and
    acts as identity on the v3 direction)."""
    F = fundamental_from_eight_point(x1, x2, w)
    v3 = _smallest_eigvec_sym3(jnp.swapaxes(F, -1, -2) @ F)
    P = jnp.eye(3, dtype=F.dtype) - v3[..., :, None] * v3[..., None, :]
    B = F @ P
    G = jnp.swapaxes(B, -1, -2) @ B + v3[..., :, None] * v3[..., None, :]
    return B @ _invsqrt_spd3(G)


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


def essentials_from_homography(H: jnp.ndarray) -> jnp.ndarray:
    """Two essential-matrix candidates from a calibrated homography.

    Faugeras-Lustman SVD decomposition of H (normalized-coordinate plane
    homography) into (R, t, n); the two sign branches with distinct rotations
    give two E = [t]_x R candidates (t's global sign does not matter for E).
    Degenerate inputs (pure rotation, near-equal singular values) produce
    near-zero x1/x3 and harmless (low-scoring) hypotheses, never NaN.

    Purpose (DEGENSAC-for-E): the linear 8-point solver is rank-deficient on
    coplanar points, so minimal 8-pt samples from low-relief scenes rarely
    generate an accurate E hypothesis. A 4-point homography fit on the same
    data is well-conditioned, and its decomposition recovers the true (R, t)
    — the reference gets this robustness from the 5-point Nister solver
    inside cv2.findEssentialMat (planar-safe); this is the batched
    fixed-shape equivalent. H: (..., 3, 3) -> (..., 2, 3, 3).
    """
    U, S, Vt = _svd3x3(H)  # closed-form: jnp.linalg.svd serializes on TPU
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d2 = jnp.maximum(S[..., 1], 1e-12)
    d1 = S[..., 0] / d2
    d3 = S[..., 2] / d2
    denom = jnp.maximum(d1 + d3, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1**2 - 1.0) / jnp.maximum(d1**2 - d3**2, 1e-12), 0.0, None))
    x3 = jnp.sqrt(jnp.clip((1.0 - d3**2) / jnp.maximum(d1**2 - d3**2, 1e-12), 0.0, None))
    stheta = jnp.sqrt(jnp.clip((d1**2 - 1.0) * (1.0 - d3**2), 0.0, None)) / denom
    ctheta = jnp.clip((1.0 + d1 * d3) / denom, -1.0, 1.0)

    def branch(sign):
        z = jnp.zeros_like(ctheta)
        o = jnp.ones_like(ctheta)
        Rp = jnp.stack(
            [
                jnp.stack([ctheta, z, -sign * stheta], -1),
                jnp.stack([z, o, z], -1),
                jnp.stack([sign * stheta, z, ctheta], -1),
            ],
            -2,
        )
        tp = jnp.stack([x1, z, -sign * x3], -1) * (d1 - d3)[..., None]
        R = s[..., None, None] * (U @ Rp @ Vt)
        t = jnp.einsum("...ij,...j->...i", U, tp)
        return lie.hat(t) @ R

    return jnp.stack([branch(1.0), branch(-1.0)], axis=-3)
