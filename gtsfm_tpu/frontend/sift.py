"""DoG-SIFT detector + descriptor as one jitted XLA program.

TPU-native replacement for OpenCV's C++ SIFT (reference
gtsfm/frontend/detector_descriptor/sift.py:24, which wraps cv2.SIFT_create).
Everything is fixed-shape: each (octave, scale) level yields a static top-K
candidate set; candidates from all levels are merged by contrast response into
a final top-K keypoint list with 128-d descriptors.

Design notes (vs. the classic algorithm):
  * Gaussian pyramid via separable 1D convolutions (XLA fuses these well).
  * Extrema detection: 3x3x3 neighborhood max/min via 2D max-pools on the
    DoG stack — no data-dependent shapes; non-extrema get -inf response and
    fall out of top-k.
  * Subpixel refinement: one 3D quadratic step (closed-form 3x3 solve) with
    edge rejection (Hessian ratio r < 10) and contrast rejection, masked not
    branched.
  * Orientation: 36-bin gradient histogram over a Gaussian window, dominant
    peak only (OpenCV emits multiple peaks; single-peak costs a few % matches
    but keeps shapes static).
  * Descriptor: Lowe's 4x4 spatial x 8 orientation trilinear histogram from a
    16x16 rotated sample grid, computed for all keypoints as one one-hot
    scatter matmul (MXU-friendly), L2-norm -> clip 0.2 -> renorm (plus a
    RootSIFT variant matching reference frontend/descriptor/rootsift.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SiftFeatures(NamedTuple):
    """Fixed-size keypoint set for one image (pad entries have mask=0)."""

    uv: jnp.ndarray  # (K, 2) full-resolution pixel coords (u=x, v=y)
    scale: jnp.ndarray  # (K,)
    response: jnp.ndarray  # (K,)
    descriptor: jnp.ndarray  # (K, 128) L2-normalized
    mask: jnp.ndarray  # (K,) {0,1}


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur, SAME padding. img: (H, W)."""
    # Banded-Toeplitz matmuls instead of 1-channel convs: a conv with
    # C_in = C_out = 1 cannot tile onto the MXU (it needs 128-wide channel
    # planes) and lowers to a scalar path — the Gaussian pyramid alone cost
    # ~240 ms/image that way (measured, v5e). As two dense matmuls
    # (By @ img @ Bx^T, ~3 GFLOP at 1088x736) the same blur is MXU work.
    # Edge-replicate padding folds into the clamped band columns, so the
    # result is bit-comparable to the padded conv. The Toeplitz factors are
    # trace-time numpy constants (compile-cached thereafter).
    By = jnp.asarray(_toeplitz_blur_matrix(img.shape[0], kernel))
    Bx = jnp.asarray(_toeplitz_blur_matrix(img.shape[1], kernel))
    return By @ img @ Bx.T


@functools.lru_cache(maxsize=None)
def _toeplitz_blur_matrix_cached(n: int, kernel_bytes: bytes,
                                 pad: str) -> np.ndarray:
    kernel = np.frombuffer(kernel_bytes, dtype=np.float32)
    r = kernel.shape[0] // 2
    B = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for t in range(kernel.shape[0]):
        cols = rows + t - r
        if pad == "edge":
            np.add.at(B, (rows, np.clip(cols, 0, n - 1)), kernel[t])
        else:  # zero padding: out-of-range taps drop
            ok = (cols >= 0) & (cols < n)
            np.add.at(B, (rows[ok], cols[ok]), kernel[t])
    return B


def _toeplitz_blur_matrix(n: int, kernel: np.ndarray,
                          pad: str = "edge") -> np.ndarray:
    return _toeplitz_blur_matrix_cached(
        int(n), kernel.astype(np.float32).tobytes(), pad
    )


def _maxpool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max pool, SAME, on (..., H, W)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) * (x.ndim - 2) + (3, 3),
        (1,) * x.ndim, "SAME",
    )


def _minpool3(x: jnp.ndarray) -> jnp.ndarray:
    return -_maxpool3(-x)


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse via the adjugate (no LU — blocked
    factorizations serialize on TPU for tiny batched matrices)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords; out-of-bounds clamped.

    Gathers from the FLATTENED image with linear indices: a 1-D gather with
    scalar indices lowers to TPU's fast dynamic-gather path, where the 2-D
    advanced-indexing form ((y, x) index tuples) lowers to a general gather
    that runs an order of magnitude slower (measured: the descriptor
    sampling dominated whole-image SIFT before this change).
    """
    H, W = img.shape
    flat = img.ravel()
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = y0 * W + x0
    v00 = flat[base]
    v01 = flat[base + 1]
    v10 = flat[base + W]
    v11 = flat[base + W + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


# --------------------------------------------------------------------------
# Per-level detection
# --------------------------------------------------------------------------


def _detect_level(
    dog: jnp.ndarray,  # (S+2, H, W) DoG stack for one octave
    level: int,  # interior level index 1..S
    k_level: int,
    contrast_thresh: float,
    edge_ratio: float,
):
    """Top-k extrema at one scale level. Returns (yx (K,2) float, resp (K,), ok (K,))."""
    d_prev, d, d_next = dog[level - 1], dog[level], dog[level + 1]
    H, W = d.shape

    neighborhood_max = jnp.maximum(jnp.maximum(_maxpool3(d_prev), _maxpool3(d_next)), _maxpool3(d))
    neighborhood_min = jnp.minimum(jnp.minimum(_minpool3(d_prev), _minpool3(d_next)), _minpool3(d))
    is_max = (d >= neighborhood_max) & (d > contrast_thresh)
    is_min = (d <= neighborhood_min) & (d < -contrast_thresh)
    is_ext = is_max | is_min

    # Edge rejection: 2x2 spatial Hessian ratio test.
    dxx = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
    dyy = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
    dxy = 0.25 * (
        jnp.roll(jnp.roll(d, -1, 0), -1, 1)
        + jnp.roll(jnp.roll(d, 1, 0), 1, 1)
        - jnp.roll(jnp.roll(d, -1, 0), 1, 1)
        - jnp.roll(jnp.roll(d, 1, 0), -1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)

    # Border exclusion.
    border = 8
    by = (jnp.arange(H) >= border) & (jnp.arange(H) < H - border)
    bx = (jnp.arange(W) >= border) & (jnp.arange(W) < W - border)
    in_border = by[:, None] & bx[None, :]

    valid = is_ext & edge_ok & in_border
    resp = jnp.where(valid, jnp.abs(d), -jnp.inf)

    flat = resp.reshape(-1)
    top_resp, top_idx = jax.lax.top_k(flat, k_level)
    yy = (top_idx // W).astype(jnp.float32)
    xx = (top_idx % W).astype(jnp.float32)
    ok = jnp.isfinite(top_resp)

    # Subpixel refinement (one quadratic step) + refined scale offset.
    yi = (top_idx // W).astype(jnp.int32)
    xi = (top_idx % W).astype(jnp.int32)

    # All candidate-point reads as flat linear-index gathers (the (y, x)
    # tuple form lowers to a much slower general gather on TPU).
    df, dnf, dpf = d.ravel(), d_next.ravel(), d_prev.ravel()
    dyyf, dxxf, dxyf = dyy.ravel(), dxx.ravel(), dxy.ravel()
    yp = jnp.clip(yi + 1, 0, H - 1) * W
    ym = jnp.clip(yi - 1, 0, H - 1) * W
    y0w = yi * W
    xp = jnp.clip(xi + 1, 0, W - 1)
    xm = jnp.clip(xi - 1, 0, W - 1)
    ctr = y0w + xi
    gy = 0.5 * (df[yp + xi] - df[ym + xi])
    gx = 0.5 * (df[y0w + xp] - df[y0w + xm])
    gs = 0.5 * (dnf[ctr] - dpf[ctr])
    hyy = dyyf[ctr]
    hxx = dxxf[ctr]
    hxy = dxyf[ctr]
    hss = dnf[ctr] + dpf[ctr] - 2 * df[ctr]
    # Cross scale-space terms:
    hys = 0.25 * (
        dnf[yp + xi] - dnf[ym + xi] - dpf[yp + xi] + dpf[ym + xi]
    )
    hxs = 0.25 * (
        dnf[y0w + xp] - dnf[y0w + xm] - dpf[y0w + xp] + dpf[y0w + xm]
    )
    Hm = jnp.stack(
        [
            jnp.stack([hyy, hxy, hys], -1),
            jnp.stack([hxy, hxx, hxs], -1),
            jnp.stack([hys, hxs, hss], -1),
        ],
        -2,
    )  # (K, 3, 3)
    g = jnp.stack([gy, gx, gs], -1)
    Hm = Hm + 1e-6 * jnp.eye(3)
    # Closed-form 3x3 solve (adjugate): batched jnp.linalg.solve lowers to a
    # blocked LU that serializes on TPU (PERF.md playbook item 1).
    offset = -jnp.einsum("kij,kj->ki", _inv3x3(Hm), g)  # (K, 3) (dy, dx, ds)
    offset = jnp.clip(offset, -0.6, 0.6)
    yy = yy + offset[:, 0]
    xx = xx + offset[:, 1]
    ds = offset[:, 2]
    return jnp.stack([yy, xx], -1), top_resp, ok, ds


# --------------------------------------------------------------------------
# Orientation + descriptor
# --------------------------------------------------------------------------


def _bilinear_stack(
    flat: jnp.ndarray,  # (L*H0*W0,) flattened padded per-level image stack
    base_off: jnp.ndarray,  # (K, 1) level offset (level_id * H0 * W0)
    w_stride: int,  # W0, the padded row stride
    Hk: jnp.ndarray,  # (K, 1) valid octave extent for clamping
    Wk: jnp.ndarray,  # (K, 1)
    y: jnp.ndarray,  # (K, S2) octave-local float coords
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear sample a stack of variably-sized level images that are
    padded into common (H0, W0) slots; flat linear-index gathers (see
    _bilinear for why)."""
    x = jnp.clip(x, 0.0, Wk - 1.001)
    y = jnp.clip(y, 0.0, Hk - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = base_off + y0 * w_stride + x0
    v00 = flat[base]
    v01 = flat[base + 1]
    v10 = flat[base + w_stride]
    v11 = flat[base + w_stride + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _bilinear_stack_vec(
    flat2: jnp.ndarray,  # (L*H0*W0, C) flattened padded stack, C-vector rows
    base_off: jnp.ndarray,  # (K, 1)
    w_stride: int,
    Hk: jnp.ndarray,  # (K, 1)
    Wk: jnp.ndarray,
    y: jnp.ndarray,  # (K, S2)
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Like _bilinear_stack but gathers C-vector ROWS per index: C values
    cost one gather index instead of C (gather throughput on TPU is
    index-rate-bound, not byte-bound — measured)."""
    x = jnp.clip(x, 0.0, Wk - 1.001)
    y = jnp.clip(y, 0.0, Hk - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    base = base_off + y0 * w_stride + x0
    v00 = flat2[base]
    v01 = flat2[base + 1]
    v10 = flat2[base + w_stride]
    v11 = flat2[base + w_stride + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _orientation(flat_g2, base_off, w_stride, Hk, Wk,
                 yx: jnp.ndarray, sigma: jnp.ndarray, n_samples: int = 11):
    """Dominant gradient orientation per keypoint.

    flat_g2: flattened padded (gy, gx)-pair stack (one slot per pyramid
    level); base_off/Hk/Wk: per-keypoint level routing + clamp.
    yx: (K, 2); sigma: (K,) orientation window sigma (1.5 * scale_sigma).
    Samples an n_samples^2 grid of radius 3*sigma, 36-bin histogram, returns
    the (smoothed) peak angle in radians.
    """
    K = yx.shape[0]
    lin = jnp.linspace(-1.0, 1.0, n_samples)
    oy, ox = jnp.meshgrid(lin, lin, indexing="ij")
    offs = jnp.stack([oy.ravel(), ox.ravel()], -1)  # (S2, 2) in units of radius
    radius = 3.0 * sigma  # (K,)
    pos = yx[:, None, :] + offs[None] * radius[:, None, None]  # (K, S2, 2)
    sy = pos[..., 0]
    sx = pos[..., 1]
    g2 = _bilinear_stack_vec(flat_g2, base_off, w_stride, Hk, Wk, sy, sx)
    gys = g2[..., 0]
    gxs = g2[..., 1]
    mag = jnp.sqrt(gxs**2 + gys**2 + 1e-12)
    ang = jnp.arctan2(gys, gxs)  # (-pi, pi]
    rr = jnp.sum(offs * offs, -1)[None]  # (1, S2) in radius units^2
    wgt = jnp.exp(-rr / (2 * (2.0 / 3.0) ** 2)) * (rr <= 1.0)  # gaussian, disc support
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    # Scatter-free histogram: one-hot mask contraction instead of K
    # independent scatter-adds (TPU serializes scatters; the one-hot
    # reduction is a vectorized elementwise+reduce the compiler fuses).
    onehot = (bins[..., None] == jnp.arange(36, dtype=jnp.int32)).astype(mag.dtype)
    hist = jnp.einsum("ks,kso->ko", mag * wgt, onehot)  # (K, 36)
    # Circular smoothing (twice).
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, -1)
    # Parabolic interpolation of the peak bin.
    hp = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
    denom = hl - 2 * hp + hr
    frac = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
    theta = (peak + frac + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi
    return theta


def _orientation_channels(gy: jnp.ndarray, gx: jnp.ndarray, n_orient: int = 8):
    """Per-pixel gradient mass linearly split over n_orient angle channels.

    Returns (H, W, n_orient). Channel o is centered at angle
    (o + 0.5) / n * 2pi - pi (matching the trilinear binning convention of
    the classic descriptor: ocoord = mod(ang + pi, 2pi)/(2pi)*n - 0.5).
    """
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    q = (jnp.mod(jnp.arctan2(gy, gx) + jnp.pi, 2 * jnp.pi)
         / (2 * jnp.pi)) * n_orient - 0.5  # (H, W) in [-0.5, n-0.5)
    i0 = jnp.floor(q)
    f = q - i0
    o = jnp.arange(n_orient, dtype=jnp.float32)
    w0 = (o[None, None] == jnp.mod(i0, n_orient)[..., None]) * (1.0 - f[..., None])
    w1 = (o[None, None] == jnp.mod(i0 + 1, n_orient)[..., None]) * f[..., None]
    return mag[..., None] * (w0 + w1)


def _blur_channels(ch: jnp.ndarray, sigma_px: float) -> jnp.ndarray:
    """Gaussian-blur each channel of (H, W, C) via Toeplitz matmuls (MXU)."""
    kernel = _gaussian_kernel1d(max(sigma_px, 0.5))
    By = jnp.asarray(_toeplitz_blur_matrix(ch.shape[0], kernel))
    Bx = jnp.asarray(_toeplitz_blur_matrix(ch.shape[1], kernel))
    x = jnp.einsum("ij,jwc->iwc", By, ch)
    return jnp.einsum("ij,hjc->hic", Bx, x)


def _descriptor(
    flat_ch,  # (L*H0*W0, n_orient) flattened blurred orientation-channel stack
    base_off,
    w_stride,
    Hk,
    Wk,
    yx: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    n_spatial: int = 4,
    n_orient: int = 8,
):
    """SIFT descriptor from pre-blurred orientation-channel maps: (K, 128).

    TPU-native reformulation of Lowe's trilinear sampling (the dense-SIFT /
    VLFeat construction): per-pixel gradient mass is split over n_orient
    angle channels ONCE per pyramid level, the channels are Gaussian-blurred
    at the level's nominal cell width (Toeplitz matmuls on the MXU — the
    blur plays the role of the per-sample spatial hat weighting), and each
    keypoint then reads just the 4x4 ROTATED cell centers (16 row-gathers of
    n_orient values instead of 256 scalar sample points x 2 gradients —
    gathers are the TPU bottleneck; measured ~20x fewer gather indices).
    The isotropic Gaussian cell window is rotation-invariant, so keypoint
    rotation only moves the sample positions; the orientation axis is then
    circularly shifted by theta with linear interpolation.
    """
    K = yx.shape[0]
    # 4x4 cell centers in bin units: -1.5, -0.5, 0.5, 1.5
    lin = jnp.arange(n_spatial, dtype=jnp.float32) - (n_spatial - 1) / 2.0
    by, bx = jnp.meshgrid(lin, lin, indexing="ij")
    bgrid = jnp.stack([by.ravel(), bx.ravel()], -1)  # (B2, 2), B2 = 16

    hist_width = 3.0 * sigma  # pixels per spatial bin (cell)
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    dx = (bgrid[None, :, 1] * ct[:, None] - bgrid[None, :, 0] * st[:, None]) * hist_width[:, None]
    dy = (bgrid[None, :, 1] * st[:, None] + bgrid[None, :, 0] * ct[:, None]) * hist_width[:, None]
    sy = yx[:, 0:1] + dy  # (K, B2)
    sx = yx[:, 1:2] + dx
    cells = _bilinear_stack_vec(flat_ch, base_off, w_stride, Hk, Wk, sy, sx)
    # (K, B2, n_orient) — world-frame orientation channels at rotated cells.

    # Gaussian window over the descriptor support (cell centers).
    r2 = jnp.sum(bgrid * bgrid, -1)[None, :, None]  # (1, B2, 1) bin units^2
    cells = cells * jnp.exp(-r2 / (2 * (n_spatial / 2.0) ** 2))

    # Rotate the orientation axis by -theta: output bin b reads channel
    # position b + theta * n / (2pi), circular linear interpolation.
    shift = theta * n_orient / (2 * jnp.pi)  # (K,)
    i0 = jnp.floor(shift)
    f = (shift - i0)[:, None, None]
    b = jnp.arange(n_orient, dtype=jnp.float32)
    src0 = jnp.mod(b[None] + i0[:, None], n_orient)  # (K, n_orient)
    src1 = jnp.mod(src0 + 1, n_orient)
    o = jnp.arange(n_orient, dtype=jnp.float32)
    R0 = (src0[:, :, None] == o[None, None]).astype(cells.dtype)  # (K, n, n)
    R1 = (src1[:, :, None] == o[None, None]).astype(cells.dtype)
    R = R0 * (1.0 - f) + R1 * f
    desc = jnp.einsum("kbc,koc->kbo", cells, R)  # (K, B2, n_orient)
    desc = desc.reshape(K, n_spatial * n_spatial * n_orient)

    # Normalize -> clip 0.2 -> renormalize (Lowe).
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return desc


# --------------------------------------------------------------------------
# Full pipeline
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints", "num_octaves", "scales_per_octave", "k_per_level", "root_sift",
    ),
)
def detect_and_describe(
    image: jnp.ndarray,
    max_keypoints: int = 4096,
    num_octaves: int = 4,
    scales_per_octave: int = 3,
    k_per_level: int = 1024,
    contrast_thresh: float = 0.015,
    edge_ratio: float = 10.0,
    root_sift: bool = True,
) -> SiftFeatures:
    """Run SIFT on a grayscale image (H, W) float32 in [0, 1].

    Returns fixed-size SiftFeatures (K = max_keypoints).
    """
    sigma0 = 1.6
    S = scales_per_octave
    kstep = 2.0 ** (1.0 / S)

    # Base image: assume camera blur 0.5, bring to sigma0.
    base = _blur(image, _gaussian_kernel1d(math.sqrt(sigma0**2 - 0.5**2)))
    H0, W0 = base.shape

    # ---- Phase 1: pyramid + detection per level. Orientation/descriptor is
    # DEFERRED to the global top-k survivors (phase 2): computing it per
    # level wastes ~3x the sampling work on candidates the final top-k
    # discards (measured ~350 ms/image of the pre-restructure cost).
    cand_yx, cand_resp, cand_ds = [], [], []
    grad_2 = []  # per level, (H0, W0, 2) (gy, gx)-pair slots
    chan = []  # per level, (H0, W0, 8) blurred orientation channels
    lvl_meta: list[tuple[int, int, int, int]] = []  # (octave, lvl, H, W)
    octave_img = base
    for o in range(num_octaves):
        H, W = octave_img.shape
        if min(H, W) < 32:
            break
        # Gaussian stack: S+3 images.
        gauss = [octave_img]
        for s in range(1, S + 3):
            sig_prev = sigma0 * kstep ** (s - 1)
            sig_cur = sigma0 * kstep**s
            dsig = math.sqrt(max(sig_cur**2 - sig_prev**2, 1e-6))
            gauss.append(_blur(gauss[-1], _gaussian_kernel1d(dsig)))
        gstack = jnp.stack(gauss)  # (S+3, H, W)
        dog = gstack[1:] - gstack[:-1]  # (S+2, H, W)

        for lvl in range(1, S + 1):
            yx, resp, ok, ds = _detect_level(dog, lvl, k_per_level, contrast_thresh, edge_ratio)
            cand_yx.append(yx)
            cand_resp.append(jnp.where(ok, resp, -jnp.inf))
            cand_ds.append(ds)
            g = gstack[lvl]
            gy_, gx_ = jnp.gradient(g)
            g2 = jnp.stack([gy_, gx_], -1)
            grad_2.append(
                jnp.zeros((H0, W0, 2), g2.dtype).at[:H, :W].set(g2)
            )
            # Orientation-channel maps blurred at the level's NOMINAL cell
            # width (hist_width = 3 * sigma0 * kstep^lvl; the per-keypoint
            # ds refinement only moves the cell-center sample spacing).
            ch = _orientation_channels(gy_, gx_)
            ch = _blur_channels(ch, 0.5 * 3.0 * sigma0 * kstep**lvl)
            chan.append(
                jnp.zeros((H0, W0, 8), ch.dtype).at[:H, :W].set(ch)
            )
            lvl_meta.append((o, lvl, H, W))

        # Downsample for next octave (take the image with sigma = 2*sigma0).
        octave_img = gauss[S][::2, ::2]

    L = len(lvl_meta)
    yx_all = jnp.concatenate(cand_yx)  # (L*k, 2) octave-local
    resp_all = jnp.concatenate(cand_resp)
    ds_all = jnp.concatenate(cand_ds)

    # ---- Phase 2: global top-k, then one orientation+descriptor pass.
    top_resp, top_idx = jax.lax.top_k(resp_all, max_keypoints)
    mask = jnp.isfinite(top_resp).astype(jnp.float32)
    lev_np = np.repeat(np.arange(L, dtype=np.int32), k_per_level)
    lev_k = jnp.asarray(lev_np)[top_idx]  # (K,) level id per keypoint
    oct_np = np.asarray([m[0] for m in lvl_meta], np.float32)
    lvl_np = np.asarray([m[1] for m in lvl_meta], np.float32)
    h_np = np.asarray([m[2] for m in lvl_meta], np.float32)
    w_np = np.asarray([m[3] for m in lvl_meta], np.float32)
    scale_mult = jnp.asarray(2.0**oct_np)[lev_k]  # (K,)
    lvl_k = jnp.asarray(lvl_np)[lev_k]
    Hk = jnp.asarray(h_np)[lev_k][:, None]
    Wk = jnp.asarray(w_np)[lev_k][:, None]
    base_off = (lev_k * (H0 * W0)).astype(jnp.int32)[:, None]

    yx_k = yx_all[top_idx]
    ds_k = ds_all[top_idx]
    sig_level = sigma0 * kstep ** (lvl_k + ds_k)  # octave units, refined
    flat_g2 = jnp.stack(grad_2).reshape(-1, 2)
    flat_ch = jnp.stack(chan).reshape(-1, 8)
    theta = _orientation(
        flat_g2, base_off, W0, Hk, Wk,
        yx_k, 1.5 * sigma0 * kstep**lvl_k,
    )
    desc = _descriptor(
        flat_ch, base_off, W0, Hk, Wk, yx_k, sig_level, theta,
    )

    uv = jnp.stack([yx_k[:, 1], yx_k[:, 0]], -1) * scale_mult[:, None]
    scale = sig_level * scale_mult
    uv = uv * mask[:, None]
    scale = scale * mask
    desc = desc * mask[:, None]
    if root_sift:
        # RootSIFT (reference frontend/descriptor/rootsift.py): L1-normalize,
        # sqrt — Hellinger kernel under L2 matching.
        desc = desc / jnp.maximum(jnp.sum(jnp.abs(desc), -1, keepdims=True), 1e-12)
        desc = jnp.sqrt(desc)
        desc = desc * mask[:, None]
    return SiftFeatures(
        uv=uv, scale=scale, response=jnp.where(mask > 0, top_resp, 0.0),
        descriptor=desc, mask=mask,
    )
