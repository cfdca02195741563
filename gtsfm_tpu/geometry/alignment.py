"""Sim(3) trajectory alignment (Umeyama) + pose comparison metrics.

TPU-native replacement for GTSAM ``Similarity3.Align`` and the comparison
helpers the reference builds on it (gtsfm/utils/geometry_comparisons.py:41-311):
closed-form Umeyama on camera centers, rotation-consensus fallback for
degenerate (panorama / collinear) geometry, and the rotation/translation
angular-error metrics used by every averaging and BA evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie


def umeyama_sim3(
    src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray | None = None, with_scale: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted Umeyama: find (s, R, t) minimizing ||dst - (s R src + t)||^2.

    src, dst: (N, 3); w: (N,) nonnegative weights. Returns (s, R(3,3), t(3,)).
    """
    if w is None:
        w = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = jnp.einsum("ni,nj,n->ij", dc, sc, w) / wsum  # dst-src cross covariance
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], src.dtype)) + jnp.diag(jnp.array([0.0, 0.0, 1.0], src.dtype)) * d
    R = U @ D @ Vt
    var_s = jnp.sum(jnp.sum(sc * sc, axis=-1) * w) / wsum
    s = jnp.where(
        jnp.asarray(with_scale),
        jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_s, 1e-12),
        jnp.ones((), src.dtype),
    )
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def align_poses_sim3(
    wRi_src: jnp.ndarray,
    wti_src: jnp.ndarray,
    wRi_dst: jnp.ndarray,
    wti_dst: jnp.ndarray,
    valid: jnp.ndarray | None = None,
):
    """Align a set of poses to a destination set with a Sim(3).

    Equivalent to reference utils/geometry_comparisons.py:85 (align_poses_sim3),
    including its panorama fallback (:116-130): when camera centers are
    (near-)coincident the Umeyama rotation is ill-defined, so the rotation is
    instead taken as the chordal-mean of dst_R_i @ src_R_i^T.

    Returns aligned (wRi, wti) and the transform (s, aRb, atb).
    """
    if valid is None:
        valid = jnp.ones(wti_src.shape[0], wti_src.dtype)
    s, R, t = umeyama_sim3(wti_src, wti_dst, valid)

    # Panorama / degenerate fallback: rotation consensus.
    spread = jnp.sqrt(jnp.sum(jnp.var(wti_src, axis=0)))
    rel = jnp.einsum("nij,nkj->nik", wRi_dst, wRi_src)  # dst_R_src per cam
    M = jnp.sum(rel * valid[:, None, None], axis=0)
    R_consensus = lie.project_to_so3(M)
    degenerate = spread < 1e-9
    R = jnp.where(degenerate, R_consensus, R)
    s = jnp.where(degenerate, jnp.ones_like(s), s)
    t = jnp.where(degenerate, jnp.zeros_like(t), t)

    aligned_R = jnp.einsum("ij,njk->nik", R, wRi_src)
    aligned_t = s * jnp.einsum("ij,nj->ni", R, wti_src) + t
    return (aligned_R, aligned_t), (s, R, t)


def rotation_errors_deg(wRi_a: jnp.ndarray, wRi_b: jnp.ndarray) -> jnp.ndarray:
    """Per-camera angular error in degrees (reference utils/metrics.py:214)."""
    return jnp.degrees(lie.rotation_angular_distance(wRi_a, wRi_b))


def translation_errors(wti_a: jnp.ndarray, wti_b: jnp.ndarray) -> jnp.ndarray:
    """Per-camera Euclidean center error."""
    return jnp.linalg.norm(wti_a - wti_b, axis=-1)


def direction_angle_deg(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Angle between directions, sign-agnostic like gtsam Unit3 comparisons? No:
    the reference measures true angle between translation directions
    (utils/geometry_comparisons.py:266-311); keep the signed-direction angle."""
    un = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    vn = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return jnp.degrees(jnp.arccos(jnp.clip(jnp.sum(un * vn, axis=-1), -1.0, 1.0)))


def compare_global_poses(
    wRi_a, wti_a, wRi_b, wti_b,
    rot_err_thresh_deg: float = 5.0,
    trans_err_atol: float = 1.0,
    trans_err_rtol: float = 0.1,
) -> bool:
    """Gauge-invariant pose-set comparison, host-side (numpy bools).

    Mirrors reference utils/geometry_comparisons.py:192 (compare_global_poses):
    Sim(3)-align a onto b, then require every rotation within
    ``rot_err_thresh_deg`` and every camera center allclose with
    (atol, rtol).
    """
    (Ra, ta), _ = align_poses_sim3(
        jnp.asarray(wRi_a), jnp.asarray(wti_a), jnp.asarray(wRi_b), jnp.asarray(wti_b)
    )
    rot_errs = np.asarray(rotation_errors_deg(Ra, jnp.asarray(wRi_b)))
    if not np.all(rot_errs < rot_err_thresh_deg):
        return False
    return np.allclose(np.asarray(ta), np.asarray(wti_b), atol=trans_err_atol, rtol=trans_err_rtol)


def compute_cyclic_rotation_error(i1Ri0, i2Ri1, i2Ri0) -> jnp.ndarray:
    """Cycle error deg: || Log( inv(i2Ri0) @ i2Ri1 @ i1Ri0 ) ||
    (reference utils/geometry_comparisons.py:355). Batched over leading dims."""
    cycle = jnp.swapaxes(i2Ri0, -1, -2) @ i2Ri1 @ i1Ri0
    return jnp.degrees(lie.rotation_angle(cycle))
