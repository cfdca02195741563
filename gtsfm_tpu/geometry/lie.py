"""SO(3) / SE(3) / Sim(3) Lie-group operations, pure JAX, batched via vmap.

TPU-native replacement for GTSAM Rot3/Pose3/Similarity3 (used throughout the
reference, e.g. gtsfm/common/types.py, gtsfm/utils/geometry_comparisons.py).

Conventions (identical to the reference / GTSAM so results are comparable):
  * rotations stored as 3x3 matrices (row-major), poses as (R, t) pairs where
    `wTi = (wRi, wti)` maps points from frame i to world:  p_w = wRi @ p_i + wti.
  * relative pose i2Ti1 maps frame i1 into frame i2.
  * so3 exp/log use the angle-axis (Rodrigues) chart with Taylor fallbacks so
    all branches are `jnp.where`-selected (XLA-friendly, no data-dependent
    control flow; safe under vmap/jit/grad).

All functions operate on single elements; batch with `jax.vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle cutoff below which Taylor expansions are used. f32-safe.
_EPS = 1e-6


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: 3-vector -> skew-symmetric 3x3."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: skew-symmetric 3x3 -> 3-vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_norm(w: jnp.ndarray) -> jnp.ndarray:
    """||w|| with a finite gradient at w = 0 (norm's sqrt(0) grad is NaN)."""
    sq = jnp.sum(w * w, axis=-1)
    return jnp.sqrt(sq + 1e-24)


def _sinc(theta: jnp.ndarray) -> jnp.ndarray:
    """sin(theta)/theta with Taylor fallback."""
    small = jnp.abs(theta) < _EPS
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)


def _cosc(theta: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(theta))/theta^2 with Taylor fallback."""
    small = jnp.abs(theta) < _EPS
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: angle-axis 3-vector -> rotation matrix."""
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    a = _sinc(theta)
    b = _cosc(theta)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> angle-axis 3-vector. Stable near 0 and pi.

    Near pi the off-diagonal antisymmetric part vanishes; recover the axis from
    the symmetric part (R + I) instead, with signs fixed from the antisymmetric
    part. All branches are where-selected.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # theta via atan2(sin, cos): arccos loses ~1e-3 rad of precision near 0/pi
    # in f32 (derivative blows up); atan2 stays accurate in both regimes.
    antisym = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin_theta = 0.5 * _safe_norm(antisym)
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = theta < _EPS
    near_pi = theta > (jnp.pi - 1e-3)
    safe_sin = jnp.where(small | near_pi, 1.0, sin_theta)  # sin_theta >= 0 here
    generic = (theta / (2.0 * safe_sin))[..., None] * antisym

    # Small branch: log(R) ~ vee(R - R^T)/2 (first order)
    small_branch = 0.5 * antisym

    # Near-pi branch: axis from largest diagonal of (R + I)/2 = axis axis^T + O(pi-theta)
    S = 0.5 * (R + jnp.eye(3, dtype=R.dtype))
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    # Select column k of S without gather gymnastics:
    Sk = jnp.where(
        (k == 0)[..., None], S[..., :, 0],
        jnp.where((k == 1)[..., None], S[..., :, 1], S[..., :, 2]),
    )
    dk = jnp.take_along_axis(diag, k[..., None], axis=-1)[..., 0]
    axis = Sk / jnp.sqrt(jnp.maximum(dk, 1e-12))[..., None]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # Fix sign so that it agrees with the antisymmetric part (zero exactly at pi,
    # in which case either sign is a valid log).
    sign = jnp.where(jnp.sum(axis * antisym, axis=-1) < 0.0, -1.0, 1.0)
    pi_branch = (sign * theta)[..., None] * axis

    out = jnp.where(small[..., None], small_branch, jnp.where(near_pi[..., None], pi_branch, generic))
    return out


def so3_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def quat_from_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0.

    Shepperd's method with all four branches computed and where-selected
    (branch-free for vmap/jit).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # branch 0: trace dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # branch 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # branch 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # branch 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    q = q * sign
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD, det corrected to +1."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(M.shape[:-2] + (2,), M.dtype), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) of a rotation matrix.

    atan2 form: full f32 resolution near 0 and pi (arccos loses ~5e-4 rad).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    sin_theta = 0.5 * _safe_norm(vee(R - jnp.swapaxes(R, -1, -2)))
    return jnp.arctan2(sin_theta, cos_theta)


def rotation_angular_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) between two rotations: ||Log(R1^T R2)||."""
    return rotation_angle(jnp.swapaxes(R1, -1, -2) @ R2)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def _left_jacobian_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): V in se3 exp, t = J @ rho."""
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    b = _cosc(theta)  # (1-cos)/theta^2
    small = jnp.abs(theta) < _EPS
    safe = jnp.where(small, 1.0, theta)
    c = jnp.where(small, 1.0 / 6.0 - theta * theta / 120.0, (safe - jnp.sin(safe)) / (safe**3))
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv_so3(w: jnp.ndarray) -> jnp.ndarray:
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    small = jnp.abs(theta) < _EPS
    safe = jnp.where(small, 1.0, theta)
    half = safe * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe * safe),
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """se(3) exp. xi = (omega[3], rho[3]) -> (R, t). GTSAM ordering (rot first)."""
    w, rho = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian_so3(w), rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> xi = (omega, rho)."""
    w = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv_so3(w), t)
    return jnp.concatenate([w, rho], axis=-1)


def se3_compose(R1, t1, R2, t2):
    """(R1,t1) * (R2,t2)."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_transform(R, t, p):
    """Apply pose to points p (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def relative_pose(wRi1, wti1, wRi2, wti2):
    """i2Ti1 = inv(wTi2) * wTi1 (maps frame i1 coords into frame i2)."""
    R2inv, t2inv = se3_inverse(wRi2, wti2)
    return se3_compose(R2inv, t2inv, wRi1, wti1)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def sim3_transform(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply similarity (s, R, t): p -> s * R @ p + t."""
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t if s.ndim else s * (R @ p) + t


def sim3_transform_pose(s, R, t, wRi, wti):
    """Transform a camera pose wTi by a Sim(3) a_S_b: returns pose in frame a.

    Matches GTSAM Similarity3.transformFrom on Pose3: rotation composes, the
    translation is scaled+rotated+offset.
    """
    return R @ wRi, s * (R @ wti) + t
