"""Batched multi-view triangulation: masked DLT + Gauss-Newton refinement.

TPU-native replacement for GTSAM ``triangulatePoint3`` (reference
gtsfm/data_association/point3d_initializer.py:189,264). The reference loops
tracks in Python and calls a C++ DLT per track; here every track in the scene
triangulates in one fused XLA program: fixed max track length, masked rows,
eigh on 4x4 normal matrices (MXU-friendly), then a few masked GN steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import cameras


def projection_matrix(wRi: jnp.ndarray, wti: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t] for world->pixel, with (R|t) = inv(wTi)."""
    Rt = jnp.swapaxes(wRi, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, wti)
    Rt_full = jnp.concatenate([Rt, t[..., None]], axis=-1)  # (..., 3, 4)
    return K @ Rt_full


def _adjugate_sym4(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of batched symmetric 4x4 matrices (cofactors)."""

    def det3(r0, r1, r2):
        a, b, c = r0
        d, e, f = r1
        g, h, i = r2
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    rows = [[M[..., i, j] for j in range(4)] for i in range(4)]
    idx = [0, 1, 2, 3]
    C = [[None] * 4 for _ in range(4)]
    for i in range(4):
        ri = [r for r in idx if r != i]
        for j in range(4):
            cj = [c for c in idx if c != j]
            minor = det3(
                [rows[ri[0]][c] for c in cj],
                [rows[ri[1]][c] for c in cj],
                [rows[ri[2]][c] for c in cj],
            )
            C[i][j] = ((-1.0) ** (i + j)) * minor
    # adj = cofactor^T; M symmetric -> adj symmetric, transpose optional.
    return jnp.stack([jnp.stack([C[j][i] for j in range(4)], -1) for i in range(4)], -2)


def _smallest_eigvec_sym4(M: jnp.ndarray, polish_iters: int = 8) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of batched symmetric PSD 4x4 matrices.

    adj(M) = sum_i (prod_{j != i} lam_j) v_i v_i^T is dominated by the
    smallest-eigenvalue term for the near-rank-3 DLT normal matrices, so its
    largest column IS (to first order) the wanted eigenvector; a few shifted
    power iterations on (tr(M) I - M) polish it. All closed-form/elementwise —
    batched jnp.linalg.eigh on millions of tiny matrices lowers to an
    iterative blocked algorithm that is orders of magnitude slower on TPU
    (same pathology as tiny LU/Cholesky)."""
    adj = _adjugate_sym4(M)
    norms = jnp.linalg.norm(adj, axis=-2)  # column norms (..., 4)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(adj, col[..., None, None], axis=-1)[..., 0]
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate (adj ~ 0, e.g. fully masked or rank <= 2): fall back to a
    # fixed start for the power iterations.
    v = jnp.where(nv > 1e-25, v / jnp.maximum(nv, 1e-30), jnp.asarray([0.5, 0.5, 0.5, 0.7], M.dtype))

    sigma = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    A = sigma * jnp.eye(4, dtype=M.dtype) - M

    def body(v, _):
        w = jnp.einsum("...ij,...j->...i", A, v)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-20), None

    v, _ = jax.lax.scan(body, v, None, length=polish_iters)
    return v


def triangulate_tracks_dlt(
    P: jnp.ndarray, uv: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Batched DLT. P: (T, L, 3, 4), uv: (T, L, 2), mask: (T, L) -> X: (T, 3)."""
    r1 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]  # (T, L, 4)
    r2 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    A = jnp.concatenate([r1, r2], axis=-2)  # (T, 2L, 4)
    m2 = jnp.concatenate([mask, mask], axis=-1)  # (T, 2L)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    A = A * m2[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Xh = _smallest_eigvec_sym4(AtA)
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w[..., None]


def refine_tracks_gn(
    wRi: jnp.ndarray,
    wti: jnp.ndarray,
    cal: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    X0: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-6,
) -> jnp.ndarray:
    """Masked Gauss-Newton refinement of triangulated points (Cal3Bundler).

    Matches GTSAM triangulatePoint3's optimize=True stage
    (point3d_initializer.py:189). All tracks refined jointly; per-track 3x3
    normal equations solved in closed form.

    wRi/wti: (T, L, 3, 3)/(T, L, 3) camera poses per measurement slot;
    cal: (T, L, 5); uv: (T, L, 2); mask: (T, L); X0: (T, 3).
    """

    def residuals(X, wRi, wti, cal, uv):
        pred, _ = cameras.project_bundler(wRi, wti, cal, X)
        return (pred - uv).reshape(-1)  # (2L,) for one track

    def per_track_step(X, wRi_t, wti_t, cal_t, uv_t, m_t):
        J = jax.jacfwd(residuals)(X, wRi_t, wti_t, cal_t, uv_t)  # (2L, 3)
        r = residuals(X, wRi_t, wti_t, cal_t, uv_t)
        m2 = jnp.repeat(m_t, 2)
        Jm = J * m2[:, None]
        rm = r * m2
        H = Jm.T @ Jm + damping * jnp.eye(3, dtype=X.dtype)
        g = Jm.T @ rm
        dX = jnp.linalg.solve(H, g)
        return X - dX

    step = jax.vmap(per_track_step)

    def body(_, X):
        return step(X, wRi, wti, cal, uv, mask)

    return jax.lax.fori_loop(0, iters, body, X0)


def reprojection_errors(
    wRi: jnp.ndarray,
    wti: jnp.ndarray,
    cal: jnp.ndarray,
    uv: jnp.ndarray,
    X: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-measurement reprojection error (pixels) and depths.

    Shapes: camera args (..., L, ...) broadcast against X (..., 3).
    Mirrors reference gtsfm/utils/reprojection.py.
    """
    pred, depth = cameras.project_bundler(wRi, wti, cal, X[..., None, :])
    err = jnp.linalg.norm(pred - uv, axis=-1)
    return err, depth


def triangulation_angles(
    wti: jnp.ndarray, X: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Max pairwise triangulation angle (degrees) per track.

    wti: (T, L, 3) camera centers; X: (T, 3); mask: (T, L).
    Mirrors reference gtsfm/utils/tracks.py triangulation-angle check.
    """
    rays = wti - X[..., None, :]  # (T, L, 3)
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.einsum("...ld,...md->...lm", rays, rays)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    pair_mask = mask[..., :, None] * mask[..., None, :]
    return jnp.max(ang * pair_mask, axis=(-2, -1))
