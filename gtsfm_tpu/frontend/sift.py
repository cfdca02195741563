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
    k = jnp.asarray(kernel)
    r = kernel.shape[0] // 2
    # rows
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    # cols
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def _maxpool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max pool, SAME, on (..., H, W)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) * (x.ndim - 2) + (3, 3),
        (1,) * x.ndim, "SAME",
    )


def _minpool3(x: jnp.ndarray) -> jnp.ndarray:
    return -_maxpool3(-x)


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords; out-of-bounds clamped."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
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

    def grad3(im, y, x, axis):
        if axis == 0:
            return 0.5 * (im[jnp.clip(y + 1, 0, H - 1), x] - im[jnp.clip(y - 1, 0, H - 1), x])
        return 0.5 * (im[y, jnp.clip(x + 1, 0, W - 1)] - im[y, jnp.clip(x - 1, 0, W - 1)])

    gy = grad3(d, yi, xi, 0)
    gx = grad3(d, yi, xi, 1)
    gs = 0.5 * (d_next[yi, xi] - d_prev[yi, xi])
    hyy = dyy[yi, xi]
    hxx = dxx[yi, xi]
    hxy = dxy[yi, xi]
    hss = d_next[yi, xi] + d_prev[yi, xi] - 2 * d[yi, xi]
    # Cross scale-space terms:
    hys = 0.25 * (
        d_next[jnp.clip(yi + 1, 0, H - 1), xi] - d_next[jnp.clip(yi - 1, 0, H - 1), xi]
        - d_prev[jnp.clip(yi + 1, 0, H - 1), xi] + d_prev[jnp.clip(yi - 1, 0, H - 1), xi]
    )
    hxs = 0.25 * (
        d_next[yi, jnp.clip(xi + 1, 0, W - 1)] - d_next[yi, jnp.clip(xi - 1, 0, W - 1)]
        - d_prev[yi, jnp.clip(xi + 1, 0, W - 1)] + d_prev[yi, jnp.clip(xi - 1, 0, W - 1)]
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
    offset = -jnp.linalg.solve(Hm, g[..., None])[..., 0]  # (K, 3) (dy, dx, ds)
    offset = jnp.clip(offset, -0.6, 0.6)
    yy = yy + offset[:, 0]
    xx = xx + offset[:, 1]
    ds = offset[:, 2]
    return jnp.stack([yy, xx], -1), top_resp, ok, ds


# --------------------------------------------------------------------------
# Orientation + descriptor
# --------------------------------------------------------------------------


def _orientation(gx: jnp.ndarray, gy: jnp.ndarray, yx: jnp.ndarray, sigma: jnp.ndarray, n_samples: int = 11):
    """Dominant gradient orientation per keypoint.

    gx, gy: (H, W) gradients at the keypoint's blur level.
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
    sy = pos[..., 0].reshape(-1)
    sx = pos[..., 1].reshape(-1)
    gxs = _bilinear(gx, sy, sx).reshape(K, -1)
    gys = _bilinear(gy, sy, sx).reshape(K, -1)
    mag = jnp.sqrt(gxs**2 + gys**2 + 1e-12)
    ang = jnp.arctan2(gys, gxs)  # (-pi, pi]
    rr = jnp.sum(offs * offs, -1)[None]  # (1, S2) in radius units^2
    wgt = jnp.exp(-rr / (2 * (2.0 / 3.0) ** 2)) * (rr <= 1.0)  # gaussian, disc support
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    hist = jax.vmap(
        lambda b, w: jnp.zeros(36).at[b].add(w)
    )(bins, mag * wgt)  # (K, 36)
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


def _descriptor(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    yx: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    n_spatial: int = 4,
    n_orient: int = 8,
    samples_per_axis: int = 16,
):
    """Lowe descriptor: (K, 128). One one-hot scatter matmul for all kpts."""
    K = yx.shape[0]
    S = samples_per_axis
    # Sample grid in bin units covering [-2, 2) bins.
    lin = (jnp.arange(S) + 0.5) / S * n_spatial - n_spatial / 2.0  # (-2, 2)
    by, bx = jnp.meshgrid(lin, lin, indexing="ij")
    bgrid = jnp.stack([by.ravel(), bx.ravel()], -1)  # (S2, 2) bin units

    hist_width = 3.0 * sigma  # pixels per spatial bin
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    # Rotate bin offsets into image coords by +theta in the same (x, y)
    # convention as the gradient angle arctan2(gy, gx):
    #   dx = bx cos(t) - by sin(t);  dy = bx sin(t) + by cos(t)
    dx = (bgrid[None, :, 1] * ct[:, None] - bgrid[None, :, 0] * st[:, None]) * hist_width[:, None]
    dy = (bgrid[None, :, 1] * st[:, None] + bgrid[None, :, 0] * ct[:, None]) * hist_width[:, None]
    sy = (yx[:, 0:1] + dy).reshape(-1)
    sx = (yx[:, 1:2] + dx).reshape(-1)
    gxs = _bilinear(gx, sy, sx).reshape(K, -1)
    gys = _bilinear(gy, sy, sx).reshape(K, -1)
    mag = jnp.sqrt(gxs**2 + gys**2 + 1e-12)
    ang = jnp.arctan2(gys, gxs) - theta[:, None]

    # Gaussian window over the descriptor support.
    r2 = jnp.sum(bgrid * bgrid, -1)[None]  # bin units^2
    wgt = jnp.exp(-r2 / (2 * (n_spatial / 2.0) ** 2))
    contrib = mag * wgt  # (K, S2)

    # Trilinear soft-binning: spatial (4x4) x orientation (8), via separable
    # weights then one-hot accumulation as a matmul.
    ycoord = bgrid[:, 0] + n_spatial / 2.0 - 0.5  # [−0.5, 3.5)
    xcoord = bgrid[:, 1] + n_spatial / 2.0 - 0.5
    ocoord = (jnp.mod(ang + jnp.pi, 2 * jnp.pi) / (2 * jnp.pi)) * n_orient - 0.5  # (K, S2)

    def axis_weights(coord, n):
        """coord (...,): returns (..., n) linear interpolation weights."""
        i0 = jnp.floor(coord)
        f = coord - i0
        idx = jnp.arange(n, dtype=coord.dtype)
        w0 = jnp.where(idx[None] == jnp.clip(i0, 0, n - 1)[..., None], 1.0 - f[..., None], 0.0)
        w1 = jnp.where(idx[None] == jnp.clip(i0 + 1, 0, n - 1)[..., None], f[..., None], 0.0)
        # Out-of-range contributions are clipped onto border bins only when
        # inside [-1, n); fully outside gets zero.
        inside0 = (i0 >= 0) & (i0 <= n - 1)
        inside1 = (i0 + 1 >= 0) & (i0 + 1 <= n - 1)
        return w0 * inside0[..., None] + w1 * inside1[..., None]

    def orient_weights(coord, n):
        i0 = jnp.floor(coord)
        f = coord - i0
        idx = jnp.arange(n, dtype=coord.dtype)
        w0 = (idx[None] == jnp.mod(i0, n)[..., None]) * (1.0 - f[..., None])
        w1 = (idx[None] == jnp.mod(i0 + 1, n)[..., None]) * f[..., None]
        return w0 + w1

    wy = axis_weights(ycoord, n_spatial)  # (S2, 4) — same grid for all kpts
    wx = axis_weights(xcoord, n_spatial)  # (S2, 4)
    wo = orient_weights(ocoord, n_orient)  # (K, S2, 8)

    # desc[k, iy, ix, io] = sum_s contrib[k, s] wy[s, iy] wx[s, ix] wo[k, s, io]
    spatial = wy[:, :, None] * wx[:, None, :]  # (S2, 4, 4)
    spatial = spatial.reshape(-1, n_spatial * n_spatial)  # (S2, 16)
    weighted = contrib[:, :, None] * wo  # (K, S2, 8)
    desc = jnp.einsum("kso,sb->kbo", weighted, spatial)  # (K, 16, 8)
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

    all_uv, all_scale, all_resp, all_ok, all_desc = [], [], [], [], []
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
            sig_level = sigma0 * kstep ** (lvl + ds)  # refined scale in octave units
            g = gstack[lvl]
            gy_, gx_ = jnp.gradient(g)
            theta = _orientation(gx_, gy_, yx, 1.5 * sigma0 * kstep**lvl * jnp.ones_like(resp))
            desc = _descriptor(gx_, gy_, yx, sig_level, theta)
            scale_mult = float(2**o)
            # uv = (x, y) in full-res coords.
            uv = jnp.stack([yx[:, 1], yx[:, 0]], -1) * scale_mult
            all_uv.append(uv)
            all_scale.append(sig_level * scale_mult)
            all_resp.append(jnp.where(ok, resp, -jnp.inf))
            all_ok.append(ok)
            all_desc.append(desc)

        # Downsample for next octave (take the image with sigma = 2*sigma0).
        octave_img = gauss[S][::2, ::2]

    uv = jnp.concatenate(all_uv)
    scale = jnp.concatenate(all_scale)
    resp = jnp.concatenate(all_resp)
    desc = jnp.concatenate(all_desc)

    top_resp, top_idx = jax.lax.top_k(resp, max_keypoints)
    mask = jnp.isfinite(top_resp).astype(jnp.float32)
    uv = uv[top_idx] * mask[:, None]
    scale = scale[top_idx] * mask
    desc = desc[top_idx] * mask[:, None]
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
