"""Classical detector/descriptor zoo as jitted XLA programs.

TPU-native replacements for the reference's OpenCV-wrapped classical
front-ends (reference gtsfm/frontend/detector/fast.py:34 cv.FastFeatureDetector,
detector/dog.py cv.SIFT detection-only, detector_descriptor/orb.py:45
cv.ORB_create, detector_descriptor/brisk.py cv.BRISK_create). Everything is
fixed-shape: per-level top-k candidate sets merged by response into a final
top-K list — the same padding discipline as frontend/sift.py.

Binary descriptors (ORB/BRISK) are emitted as float {0,1} arrays of length
256/512 so Hamming matching maps onto one MXU matmul
(ops/matching.match_hamming).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.sift import _bilinear, _blur, _gaussian_kernel1d, _maxpool3


class Features(NamedTuple):
    """Fixed-size keypoint set for one image (pad entries have mask=0)."""

    uv: jnp.ndarray  # (K, 2) full-resolution pixel coords (u=x, v=y)
    scale: jnp.ndarray  # (K,)
    response: jnp.ndarray  # (K,)
    descriptor: jnp.ndarray  # (K, D); zero-width for detector-only ops
    mask: jnp.ndarray  # (K,) {0,1}


# Bresenham circle of radius 3 — the 16 FAST segment-test offsets, in ring
# order (dy, dx).
_FAST_RING = np.asarray(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)


def fast_response(image: jnp.ndarray, threshold: float, arc_length: int = 9) -> jnp.ndarray:
    """FAST-9/16 segment-test corner response map.

    A pixel is a corner if >= ``arc_length`` CONTIGUOUS ring pixels are all
    brighter than center+t or all darker than center-t. Response is the SAD
    margin sum(max(|ring - center| - t, 0)) over the ring (OpenCV's fast
    score proxy). Non-corners get 0.
    """
    ring = jnp.stack(
        [jnp.roll(image, (-int(dy), -int(dx)), (0, 1)) for dy, dx in _FAST_RING]
    )  # (16, H, W): ring[k] = I[y + dy_k, x + dx_k]
    diff = ring - image[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def has_arc(m):  # m: (16, H, W) bool
        ok = jnp.zeros(image.shape, bool)
        for start in range(16):
            seg = m[start]
            for j in range(1, arc_length):
                seg = seg & m[(start + j) % 16]
            ok = ok | seg
        return ok

    is_corner = has_arc(brighter) | has_arc(darker)
    score = jnp.sum(jnp.maximum(jnp.abs(diff) - threshold, 0.0), axis=0)
    return jnp.where(is_corner, score, 0.0)


def harris_response(image: jnp.ndarray, k: float = 0.04, sigma: float = 1.5) -> jnp.ndarray:
    """Harris corner response det(M) - k tr(M)^2 with Gaussian-windowed M."""
    gy, gx = jnp.gradient(image)
    kern = _gaussian_kernel1d(sigma)
    sxx = _blur(gx * gx, kern)
    syy = _blur(gy * gy, kern)
    sxy = _blur(gx * gy, kern)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _top_k_nms(resp: jnp.ndarray, k: int, border: int = 16):
    """3x3 NMS then top-k. Returns (yx (k,2) float, resp (k,), ok (k,))."""
    H, W = resp.shape
    is_peak = resp >= _maxpool3(resp)
    by = (jnp.arange(H) >= border) & (jnp.arange(H) < H - border)
    bx = (jnp.arange(W) >= border) & (jnp.arange(W) < W - border)
    valid = is_peak & (resp > 0) & by[:, None] & bx[None, :]
    flat = jnp.where(valid, resp, -jnp.inf).reshape(-1)
    top_resp, top_idx = jax.lax.top_k(flat, k)
    yy = (top_idx // W).astype(jnp.float32)
    xx = (top_idx % W).astype(jnp.float32)
    return jnp.stack([yy, xx], -1), top_resp, jnp.isfinite(top_resp)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "arc_length"))
def detect_fast(
    image: jnp.ndarray,
    max_keypoints: int = 4096,
    threshold: float = 10.0 / 255.0,
    arc_length: int = 9,
) -> Features:
    """FAST detector (reference gtsfm/frontend/detector/fast.py). Grayscale
    [0,1] image -> top-K corners, no descriptor (descriptor has width 0)."""
    resp = fast_response(image, threshold, arc_length)
    yx, r, ok = _top_k_nms(resp, max_keypoints, border=4)
    mask = ok.astype(jnp.float32)
    uv = jnp.stack([yx[:, 1], yx[:, 0]], -1) * mask[:, None]
    return Features(
        uv=uv,
        scale=jnp.full((max_keypoints,), 1.0) * mask,
        response=jnp.where(ok, r, 0.0),
        descriptor=jnp.zeros((max_keypoints, 0), jnp.float32),
        mask=mask,
    )


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def detect_harris(
    image: jnp.ndarray, max_keypoints: int = 4096, k: float = 0.04
) -> Features:
    """Harris corner detector -> top-K corners, no descriptor."""
    resp = harris_response(image, k)
    yx, r, ok = _top_k_nms(jnp.maximum(resp, 0.0), max_keypoints, border=4)
    mask = ok.astype(jnp.float32)
    return Features(
        uv=jnp.stack([yx[:, 1], yx[:, 0]], -1) * mask[:, None],
        scale=jnp.full((max_keypoints,), 1.0) * mask,
        response=jnp.where(ok, r, 0.0),
        descriptor=jnp.zeros((max_keypoints, 0), jnp.float32),
        mask=mask,
    )


def detect_dog(image: jnp.ndarray, max_keypoints: int = 4096) -> Features:
    """DoG detector (reference gtsfm/frontend/detector/dog.py — SIFT
    detection without description): runs the SIFT pyramid and drops the
    descriptor."""
    from gtsfm_tpu.frontend import sift

    f = sift.detect_and_describe(image, max_keypoints=max_keypoints)
    return Features(
        uv=f.uv, scale=f.scale, response=f.response,
        descriptor=jnp.zeros((max_keypoints, 0), jnp.float32), mask=f.mask,
    )


# ---------------------------------------------------------------------------
# ORB: oriented multi-scale FAST + steered binary descriptor
# ---------------------------------------------------------------------------


def _orb_pattern(n_bits: int = 256, patch: int = 31, seed: int = 7) -> np.ndarray:
    """(n_bits, 4) int offsets (y1, x1, y2, x2) for the binary tests.

    The original ORB pattern was machine-learned offline; we use the BRIEF-II
    construction it was seeded from — test endpoints drawn i.i.d. from
    N(0, (patch/5)^2), clipped to the patch — with a fixed seed so every image
    sees the same pattern (Calonder et al., BRIEF, ECCV 2010).
    """
    rng = np.random.default_rng(seed)
    sigma = patch / 5.0
    half = patch // 2 - 2
    pts = np.clip(rng.normal(0.0, sigma, size=(n_bits, 4)), -half, half)
    return pts.astype(np.float32)


def _intensity_centroid_angle(image: jnp.ndarray, yx: jnp.ndarray, radius: int = 15):
    """Rosin intensity-centroid orientation theta = atan2(m01, m10) over a
    circular patch (the ORB orientation operator)."""
    lin = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(lin, lin, indexing="ij")
    disc = (oy**2 + ox**2 <= radius**2).astype(jnp.float32)
    sy = (yx[:, 0:1] + oy.ravel()[None]).reshape(-1)
    sx = (yx[:, 1:2] + ox.ravel()[None]).reshape(-1)
    vals = _bilinear(image, sy, sx).reshape(yx.shape[0], -1) * disc.ravel()[None]
    m10 = jnp.sum(vals * ox.ravel()[None], -1)
    m01 = jnp.sum(vals * oy.ravel()[None], -1)
    return jnp.arctan2(m01, m10)


def _steered_binary_descriptor(
    image_blur: jnp.ndarray, yx: jnp.ndarray, theta: jnp.ndarray, pattern: np.ndarray
):
    """Sample rotated test pairs; bit = I(p1) < I(p2). Returns (K, n_bits)."""
    pat = jnp.asarray(pattern)  # (D, 4) = (y1, x1, y2, x2)
    ct, st = jnp.cos(theta), jnp.sin(theta)  # (K,)

    def rot(y, x):
        ry = x[None] * st[:, None] + y[None] * ct[:, None]
        rx = x[None] * ct[:, None] - y[None] * st[:, None]
        return ry, rx  # (K, D)

    r1y, r1x = rot(pat[:, 0], pat[:, 1])
    r2y, r2x = rot(pat[:, 2], pat[:, 3])
    K, D = r1y.shape
    s1 = _bilinear(image_blur, (yx[:, 0:1] + r1y).reshape(-1), (yx[:, 1:2] + r1x).reshape(-1))
    s2 = _bilinear(image_blur, (yx[:, 0:1] + r2y).reshape(-1), (yx[:, 1:2] + r2x).reshape(-1))
    return (s1.reshape(K, D) < s2.reshape(K, D)).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "num_levels", "k_per_level")
)
def orb_detect_and_describe(
    image: jnp.ndarray,
    max_keypoints: int = 4096,
    num_levels: int = 8,
    scale_factor: float = 1.2,
    fast_threshold: float = 10.0 / 255.0,
    k_per_level: int = 1024,
) -> Features:
    """ORB (reference gtsfm/frontend/detector_descriptor/orb.py:45): FAST on
    an image pyramid, Harris-ranked, intensity-centroid orientation, steered
    256-bit binary descriptor. Match with ops/matching.match_hamming."""
    pattern = _orb_pattern()
    H0, W0 = image.shape
    all_uv, all_scale, all_resp, all_ok, all_desc = [], [], [], [], []
    for lvl in range(num_levels):
        s = scale_factor**lvl
        H, W = int(round(H0 / s)), int(round(W0 / s))
        if min(H, W) < 64:
            break
        img = image if lvl == 0 else jax.image.resize(image, (H, W), "linear")
        resp_fast = fast_response(img, fast_threshold)
        # Harris ranking of FAST corners (ORB's HARRIS_SCORE default).
        resp_harris = harris_response(img)
        resp = jnp.where(resp_fast > 0, jnp.maximum(resp_harris, 1e-12), 0.0)
        yx, r, ok = _top_k_nms(resp, k_per_level, border=17)
        theta = _intensity_centroid_angle(img, yx)
        img_blur = _blur(img, _gaussian_kernel1d(2.0))
        desc = _steered_binary_descriptor(img_blur, yx, theta, pattern)
        all_uv.append(jnp.stack([yx[:, 1], yx[:, 0]], -1) * s)
        all_scale.append(jnp.full((k_per_level,), s))
        all_resp.append(jnp.where(ok, r, -jnp.inf))
        all_ok.append(ok)
        all_desc.append(desc)

    uv = jnp.concatenate(all_uv)
    scale = jnp.concatenate(all_scale)
    resp = jnp.concatenate(all_resp)
    desc = jnp.concatenate(all_desc)
    top_resp, top_idx = jax.lax.top_k(resp, max_keypoints)
    mask = jnp.isfinite(top_resp).astype(jnp.float32)
    return Features(
        uv=uv[top_idx] * mask[:, None],
        scale=scale[top_idx] * mask,
        response=jnp.where(mask > 0, top_resp, 0.0),
        descriptor=desc[top_idx] * mask[:, None],
        mask=mask,
    )


# ---------------------------------------------------------------------------
# BRISK: multi-scale FAST (AGAST stand-in) + concentric sampling pattern
# ---------------------------------------------------------------------------


def _brisk_pattern():
    """BRISK concentric sampling pattern (Leutenegger et al., ICCV 2011):
    points on rings around the keypoint, each smoothed proportionally to its
    ring spacing; SHORT pairs (< 9.75) form descriptor bits, LONG pairs
    (> 13.67) vote for orientation. Returns (points (60,2) yx, sigmas (60,),
    short_pairs (S,2) idx, long_pairs (L,2) idx) as numpy."""
    radii = [0.0, 2.9, 4.9, 7.4, 10.8]
    counts = [1, 10, 14, 15, 20]
    pts, sig = [], []
    for r, c in zip(radii, counts):
        for i in range(c):
            a = 2 * math.pi * i / c + (0.5 * math.pi / c if r > 0 else 0.0)
            pts.append((r * math.sin(a), r * math.cos(a)))
            sig.append(max(0.5, 0.55 * (2 * math.pi * r / c) if c > 1 and r > 0 else 0.5))
    pts = np.asarray(pts, np.float32)
    sig = np.asarray(sig, np.float32)
    n = len(pts)
    dist = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    iu = np.triu_indices(n, 1)
    d = dist[iu]
    pairs = np.stack(iu, -1)
    short = pairs[d < 9.75]
    long_ = pairs[d > 13.67]
    # 512 descriptor bits: the shortest pairs are most local/stable.
    order = np.argsort(d[d < 9.75])
    short = short[order[:512]]
    return pts, sig, short.astype(np.int32), long_.astype(np.int32)


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "num_levels", "k_per_level")
)
def brisk_detect_and_describe(
    image: jnp.ndarray,
    max_keypoints: int = 4096,
    num_levels: int = 4,
    scale_factor: float = 1.5,
    fast_threshold: float = 12.0 / 255.0,
    k_per_level: int = 1024,
) -> Features:
    """BRISK (reference gtsfm/frontend/detector_descriptor/brisk.py): FAST
    corners across a coarse pyramid + rotation-steered 512-bit descriptor
    from the BRISK concentric pattern."""
    pts_np, sig_np, short_np, long_np = _brisk_pattern()
    pts = jnp.asarray(pts_np)  # (60, 2) yx offsets
    short = jnp.asarray(short_np)
    long_ = jnp.asarray(long_np)

    H0, W0 = image.shape
    all_uv, all_scale, all_resp, all_ok, all_desc = [], [], [], [], []
    for lvl in range(num_levels):
        s = scale_factor**lvl
        H, W = int(round(H0 / s)), int(round(W0 / s))
        if min(H, W) < 64:
            break
        img = image if lvl == 0 else jax.image.resize(image, (H, W), "linear")
        resp = fast_response(img, fast_threshold)
        yx, r, ok = _top_k_nms(resp, k_per_level, border=14)
        K = yx.shape[0]
        # Pattern-point samples on a lightly smoothed image (one blur level
        # stands in for per-ring smoothing; rings are close in sigma).
        img_s = _blur(img, _gaussian_kernel1d(1.2))
        sy = (yx[:, 0:1] + pts[None, :, 0]).reshape(-1)
        sx = (yx[:, 1:2] + pts[None, :, 1]).reshape(-1)
        vals = _bilinear(img_s, sy, sx).reshape(K, -1)  # (K, 60)
        # Orientation: mean local gradient over LONG pairs
        #   g = sum (I(pj) - I(pi)) * (pj - pi) / |pj - pi|^2.
        dp = pts[long_[:, 1]] - pts[long_[:, 0]]  # (L, 2) yx
        inv_d2 = 1.0 / jnp.maximum(jnp.sum(dp * dp, -1), 1e-6)
        dv = vals[:, long_[:, 1]] - vals[:, long_[:, 0]]  # (K, L)
        gy = jnp.sum(dv * dp[None, :, 0] * inv_d2[None], -1)
        gx = jnp.sum(dv * dp[None, :, 1] * inv_d2[None], -1)
        theta = jnp.arctan2(gy, gx)
        # Steer the pattern by -theta and resample for the bits.
        ct, st = jnp.cos(theta), jnp.sin(theta)
        ry = pts[None, :, 1] * st[:, None] + pts[None, :, 0] * ct[:, None]
        rx = pts[None, :, 1] * ct[:, None] - pts[None, :, 0] * st[:, None]
        vals_r = _bilinear(
            img_s, (yx[:, 0:1] + ry).reshape(-1), (yx[:, 1:2] + rx).reshape(-1)
        ).reshape(K, -1)
        desc = (vals_r[:, short[:, 0]] < vals_r[:, short[:, 1]]).astype(jnp.float32)
        all_uv.append(jnp.stack([yx[:, 1], yx[:, 0]], -1) * s)
        all_scale.append(jnp.full((k_per_level,), s))
        all_resp.append(jnp.where(ok, r, -jnp.inf))
        all_ok.append(ok)
        all_desc.append(desc)

    uv = jnp.concatenate(all_uv)
    scale = jnp.concatenate(all_scale)
    resp = jnp.concatenate(all_resp)
    desc = jnp.concatenate(all_desc)
    top_resp, top_idx = jax.lax.top_k(resp, max_keypoints)
    mask = jnp.isfinite(top_resp).astype(jnp.float32)
    return Features(
        uv=uv[top_idx] * mask[:, None],
        scale=scale[top_idx] * mask,
        response=jnp.where(mask > 0, top_resp, 0.0),
        descriptor=desc[top_idx] * mask[:, None],
        mask=mask,
    )
