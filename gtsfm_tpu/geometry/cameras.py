"""Camera calibration models + projection, pure JAX, vmap-first.

TPU-native replacement for GTSAM Cal3Bundler / Cal3Fisheye and
PinholeCameraCal3* (reference gtsfm/common/types.py:7-10).

Calibration is a flat parameter vector so it slots directly into batched
bundle-adjustment state:

  * ``CAL3_BUNDLER``: ``(f, k1, k2, u0, v0)`` — single focal, 2-coefficient
    radial distortion applied in normalized coords, principal point.
    uncalibrate: ``uv = f * (1 + k1 r^2 + k2 r^4) * p + (u0, v0)``
    (matches GTSAM Cal3Bundler used at reference bundle/bundle_adjustment.py:106).
  * ``CAL3_FISHEYE``: ``(fx, fy, s, u0, v0, k1, k2, k3, k4)`` — equidistant
    fisheye model (matches GTSAM Cal3Fisheye used for the Hilti rig).

Pose convention: ``wTi = (wRi, wti)`` is camera-to-world (GTSAM PinholeCamera
pose); projecting a world point first maps it into the camera frame with the
inverse pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Parameter vector sizes.
CAL3_BUNDLER_DIM = 5
CAL3_FISHEYE_DIM = 9


def bundler_params(f, k1=0.0, k2=0.0, u0=0.0, v0=0.0, dtype=jnp.float32):
    return jnp.asarray([f, k1, k2, u0, v0], dtype=dtype)


def bundler_from_K(K: jnp.ndarray, k1=0.0, k2=0.0) -> jnp.ndarray:
    """Build Cal3Bundler params from a 3x3 intrinsics matrix (fx~fy averaged)."""
    f = 0.5 * (K[0, 0] + K[1, 1])
    return jnp.stack([f, jnp.asarray(k1, K.dtype), jnp.asarray(k2, K.dtype), K[0, 2], K[1, 2]])


def K_from_bundler(cal: jnp.ndarray) -> jnp.ndarray:
    """3x3 intrinsics matrix from Cal3Bundler params (ignoring distortion)."""
    f, _, _, u0, v0 = cal[..., 0], cal[..., 1], cal[..., 2], cal[..., 3], cal[..., 4]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    return jnp.stack(
        [
            jnp.stack([f, z, u0], axis=-1),
            jnp.stack([z, f, v0], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def bundler_uncalibrate(cal: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Normalized image coords -> pixel coords under Cal3Bundler."""
    f, k1, k2 = cal[..., 0], cal[..., 1], cal[..., 2]
    u0v0 = cal[..., 3:5]
    r2 = jnp.sum(p * p, axis=-1)
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    return (f * g)[..., None] * p + u0v0


def bundler_calibrate(cal: jnp.ndarray, uv: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Pixel coords -> normalized coords (inverse distortion by fixed point).

    GTSAM uses an iterative inverse too (Cal3Bundler::calibrate); 10 fixed-point
    iterations matches its accuracy for realistic k1/k2.
    """
    f, k1, k2 = cal[..., 0], cal[..., 1], cal[..., 2]
    u0v0 = cal[..., 3:5]
    pd = (uv - u0v0) / f[..., None]  # distorted normalized coords

    def body(_, p):
        r2 = jnp.sum(p * p, axis=-1)
        g = 1.0 + k1 * r2 + k2 * r2 * r2
        return pd / g[..., None]

    return jax.lax.fori_loop(0, iters, body, pd)


def fisheye_params(fx, fy, s, u0, v0, k1=0.0, k2=0.0, k3=0.0, k4=0.0, dtype=jnp.float32):
    return jnp.asarray([fx, fy, s, u0, v0, k1, k2, k3, k4], dtype=dtype)


def fisheye_uncalibrate(cal: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Normalized coords -> pixels under the equidistant fisheye model."""
    fx, fy, s = cal[..., 0], cal[..., 1], cal[..., 2]
    u0, v0 = cal[..., 3], cal[..., 4]
    k = cal[..., 5:9]
    r = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), 1e-12))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k[..., 0] * t2 + k[..., 1] * t2**2 + k[..., 2] * t2**3 + k[..., 3] * t2**4)
    scale = theta_d / r
    xd = scale * p[..., 0]
    yd = scale * p[..., 1]
    u = fx * xd + s * yd + u0
    v = fy * yd + v0
    return jnp.stack([u, v], axis=-1)


def fisheye_calibrate(cal: jnp.ndarray, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Pixels -> normalized pinhole coords under the equidistant fisheye model
    (inverse of :func:`fisheye_uncalibrate`; GTSAM Cal3Fisheye::calibrate).

    Newton iteration on theta(1 + k1 t2 + k2 t4 + k3 t6 + k4 t8) = theta_d,
    then r = tan(theta) recovers the pinhole radius.
    """
    fx, fy, s = cal[..., 0], cal[..., 1], cal[..., 2]
    u0, v0 = cal[..., 3], cal[..., 4]
    k = cal[..., 5:9]
    yd = (uv[..., 1] - v0) / fy
    xd = (uv[..., 0] - u0 - s * yd) / fx
    theta_d = jnp.sqrt(jnp.maximum(xd * xd + yd * yd, 1e-18))

    def body(_, theta):
        t2 = theta * theta
        poly = 1.0 + k[..., 0] * t2 + k[..., 1] * t2**2 + k[..., 2] * t2**3 + k[..., 3] * t2**4
        dpoly = (
            2 * k[..., 0] * theta + 4 * k[..., 1] * theta * t2
            + 6 * k[..., 2] * theta * t2**2 + 8 * k[..., 3] * theta * t2**3
        )
        f_val = theta * poly - theta_d
        f_der = poly + theta * dpoly
        return theta - f_val / jnp.maximum(f_der, 1e-9)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    r = jnp.tan(jnp.clip(theta, 0.0, 1.55))
    scale = r / theta_d
    return jnp.stack([xd * scale, yd * scale], axis=-1)


def fisheye_to_virtual_pinhole(cal9: jnp.ndarray, uv: jnp.ndarray):
    """Undistort fisheye pixels into a VIRTUAL PINHOLE camera sharing
    (f=(fx+fy)/2, pp): returns (uv_pinhole, cal3bundler_params). Lets the
    whole downstream pipeline (RANSAC, triangulation, Cal3Bundler BA) run
    unchanged on rig/fisheye datasets."""
    xn = fisheye_calibrate(cal9, uv)
    f = 0.5 * (cal9[..., 0] + cal9[..., 1])
    u0, v0 = cal9[..., 3], cal9[..., 4]
    uv_pin = xn * f[..., None] + jnp.stack([u0, v0], -1)
    cal5 = jnp.stack([f, jnp.zeros_like(f), jnp.zeros_like(f), u0, v0], -1)
    return uv_pin, cal5


def world_to_camera(wRi: jnp.ndarray, wti: jnp.ndarray, p_world: jnp.ndarray) -> jnp.ndarray:
    """Map world points into camera frame i: p_i = wRi^T (p_w - wti)."""
    return jnp.einsum("...ji,...j->...i", wRi, p_world - wti)


def project_bundler(
    wRi: jnp.ndarray, wti: jnp.ndarray, cal: jnp.ndarray, p_world: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project a world point through a Cal3Bundler camera.

    Returns (uv, depth). depth <= 0 means the point is behind the camera
    (caller masks; no exceptions, so this stays jittable — contrast the
    reference which lets GTSAM throw CheiralityException).
    """
    pc = world_to_camera(wRi, wti, p_world)
    depth = pc[..., 2]
    safe_z = jnp.where(jnp.abs(depth) < 1e-9, 1e-9, depth)
    pn = pc[..., :2] / safe_z[..., None]
    return bundler_uncalibrate(cal, pn), depth




def project_fisheye(
    wRi: jnp.ndarray, wti: jnp.ndarray, cal9: jnp.ndarray, p_world: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project a world point through a Cal3Fisheye camera (equidistant model,
    reference gtsam Cal3Fisheye / gtsfm common/types.py:9-10). Returns
    (uv, depth); caller masks depth <= 0."""
    pc = world_to_camera(wRi, wti, p_world)
    depth = pc[..., 2]
    safe_z = jnp.where(jnp.abs(depth) < 1e-9, 1e-9, depth)
    pn = pc[..., :2] / safe_z[..., None]
    return fisheye_uncalibrate(cal9, pn), depth


def project_camera(
    wRi: jnp.ndarray, wti: jnp.ndarray, cal: jnp.ndarray, p_world: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-model dispatch by calibration width: 5 params = Cal3Bundler,
    9 = Cal3Fisheye (the reference's CALIBRATION_TYPE union,
    common/types.py:9-13, resolved statically at trace time)."""
    if cal.shape[-1] == 9:
        return project_fisheye(wRi, wti, cal, p_world)
    return project_bundler(wRi, wti, cal, p_world)


def backproject_bundler(
    wRi: jnp.ndarray, wti: jnp.ndarray, cal: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of project: pixel + depth -> world point."""
    pn = bundler_calibrate(cal, uv)
    pc = jnp.concatenate([pn * depth[..., None], depth[..., None]], axis=-1)
    return jnp.einsum("...ij,...j->...i", wRi, pc) + wti


def normalize_keypoints(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized coords with a 3x3 K (no distortion).

    Mirrors reference gtsfm/utils/features.py normalize_coordinates.
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    skew = K[..., 0, 1]
    u0, v0 = K[..., 0, 2], K[..., 1, 2]
    y = (uv[..., 1] - v0) / fy
    x = (uv[..., 0] - u0 - skew * y) / fx
    return jnp.stack([x, y], axis=-1)
