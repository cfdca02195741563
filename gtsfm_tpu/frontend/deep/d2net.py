"""D2-Net detect-and-describe network in Flax.

TPU-native replacement for the torch D2Net the reference wraps
(gtsfm/frontend/detector_descriptor/d2net.py:122; model at
thirdparty/d2net/lib/model_test.py — VGG16 conv1_1..conv4_3 trunk with the
dilation trick, hard detection module, handcrafted subpixel localization).

Differences forced by fixed shapes: torch's ``torch.nonzero`` detection-mask
gather becomes masked top-k over the score map (score = feature value where
it is both channel-wise and spatial local max, edge-filtered); everything
else follows the reference math. Weights load from the upstream
``d2_tf.pth``-style checkpoints via :func:`convert_torch_checkpoint`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class D2NetFeatures(NamedTuple):
    uv: jnp.ndarray  # (K, 2) full-res pixel coords (u=x, v=y)
    response: jnp.ndarray  # (K,)
    descriptor: jnp.ndarray  # (K, 512) L2-normalized
    mask: jnp.ndarray  # (K,)


class D2NetBackbone(nn.Module):
    """VGG16 trunk through conv4_3 with dilated conv4 block (NHWC).

    Layer names mirror the torch Sequential indices of the reference model
    (model_test.py DenseFeatureExtractionModule) so the converter is 1:1.
    """

    use_final_relu: bool = True

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3)
        relu = nn.relu
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        y = relu(nn.Conv(64, (3, 3), name="conv0")(x))
        y = relu(nn.Conv(64, (3, 3), name="conv2")(y))
        y = pool(y)
        y = relu(nn.Conv(128, (3, 3), name="conv5")(y))
        y = relu(nn.Conv(128, (3, 3), name="conv7")(y))
        y = pool(y)
        y = relu(nn.Conv(256, (3, 3), name="conv10")(y))
        y = relu(nn.Conv(256, (3, 3), name="conv12")(y))
        y = relu(nn.Conv(256, (3, 3), name="conv14")(y))
        # AvgPool2d(2, stride=1) — SAME padding keeps the fixed shape (the
        # half-pixel shift is absorbed by the keypoint upscaling constant).
        y = nn.avg_pool(y, (2, 2), strides=(1, 1), padding="SAME")
        y = relu(nn.Conv(512, (3, 3), kernel_dilation=2, name="conv17")(y))
        y = relu(nn.Conv(512, (3, 3), kernel_dilation=2, name="conv19")(y))
        y = nn.Conv(512, (3, 3), kernel_dilation=2, name="conv21")(y)
        if self.use_final_relu:
            y = relu(y)
        return y  # (B, H/4, W/4, 512)


def _pool3(x, op, init):
    return jax.lax.reduce_window(x, init, op, (3, 3, 1), (1, 1, 1), "SAME")


def detection_scores(feat: jnp.ndarray, edge_threshold: float = 5.0) -> jnp.ndarray:
    """Hard-detection score map (reference HardDetectionModule).

    feat: (Hc, Wc, C). A location scores its channel-max value iff that value
    is (a) the channel-wise max, (b) a 3x3 spatial local max of its channel,
    and (c) not edge-like (2x2 spatial Hessian trace/det ratio test on that
    channel). Returns (Hc, Wc) scores (0 where not detected).
    """
    cmax = jnp.max(feat, axis=-1)  # (Hc, Wc)
    best_c = jnp.argmax(feat, axis=-1)
    local_max = _pool3(feat, jax.lax.max, -jnp.inf)
    is_local = jnp.take_along_axis(
        feat == local_max, best_c[..., None], axis=-1
    )[..., 0]

    # Finite-difference Hessian of the selected channel map.
    d = jnp.take_along_axis(feat, best_c[..., None], axis=-1)[..., 0]
    dii = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
    djj = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
    dij = 0.25 * (
        jnp.roll(jnp.roll(d, -1, 0), -1, 1)
        + jnp.roll(jnp.roll(d, 1, 0), 1, 1)
        - jnp.roll(jnp.roll(d, -1, 0), 1, 1)
        - jnp.roll(jnp.roll(d, 1, 0), -1, 1)
    )
    det = dii * djj - dij * dij
    tr = dii + djj
    thr = (edge_threshold + 1) ** 2 / edge_threshold
    not_edge = (det > 0) & (tr * tr / jnp.maximum(det, 1e-12) <= thr)
    return jnp.where(is_local & not_edge, cmax, 0.0)


def localize(feat: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Handcrafted subpixel displacement (reference
    HandcraftedLocalizationModule): one Newton step -H^-1 g on the
    channel-max map at integer positions yx (K, 2). Returns (K, 2) (dy, dx).
    """
    d = jnp.max(feat, axis=-1)
    H, W = d.shape
    yi = yx[:, 0].astype(jnp.int32)
    xi = yx[:, 1].astype(jnp.int32)
    cy = lambda a: jnp.clip(a, 0, H - 1)
    cx = lambda a: jnp.clip(a, 0, W - 1)
    gi = 0.5 * (d[cy(yi + 1), xi] - d[cy(yi - 1), xi])
    gj = 0.5 * (d[yi, cx(xi + 1)] - d[yi, cx(xi - 1)])
    dii = d[cy(yi + 1), xi] + d[cy(yi - 1), xi] - 2 * d[yi, xi]
    djj = d[yi, cx(xi + 1)] + d[yi, cx(xi - 1)] - 2 * d[yi, xi]
    dij = 0.25 * (
        d[cy(yi + 1), cx(xi + 1)] + d[cy(yi - 1), cx(xi - 1)]
        - d[cy(yi + 1), cx(xi - 1)] - d[cy(yi - 1), cx(xi + 1)]
    )
    det = dii * djj - dij * dij
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    dy = -(djj * gi - dij * gj) / det
    dx = -(-dij * gi + dii * gj) / det
    return jnp.stack([dy, dx], -1)


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def _postprocess(feat, max_keypoints: int):
    """feat: (1, Hc, Wc, 512) -> top-K keypoints at full resolution."""
    f = feat[0]
    Hc, Wc, C = f.shape
    scores = detection_scores(f)
    flat = jnp.where(scores > 0, scores, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    ok = jnp.isfinite(vals)
    yi = (idx // Wc).astype(jnp.float32)
    xi = (idx % Wc).astype(jnp.float32)
    disp = localize(f, jnp.stack([yi, xi], -1))
    # Reference masks |displacement| >= 0.5 (pyramid.py).
    ok = ok & (jnp.abs(disp[:, 0]) < 0.5) & (jnp.abs(disp[:, 1]) < 0.5)
    yf = yi + disp[:, 0]
    xf = xi + disp[:, 1]
    # Descriptors: L2-normalized dense features at the integer cell.
    desc = f[yi.astype(jnp.int32), xi.astype(jnp.int32)]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    # Upscale fmap coords -> input pixels: two scaling steps p -> 2p + 0.5
    # (reference utils.upscale_positions with scaling_steps=2).
    uv = jnp.stack([4.0 * xf + 1.5, 4.0 * yf + 1.5], -1)
    mask = ok.astype(jnp.float32)
    return D2NetFeatures(
        uv=uv * mask[:, None],
        response=jnp.where(ok, vals, 0.0),
        descriptor=desc * mask[:, None],
        mask=mask,
    )


class D2Net:
    """Stateful wrapper: params + jitted apply."""

    def __init__(self, params=None, max_keypoints: int = 2048,
                 checkpoint_path: str | None = None):
        self.net = D2NetBackbone()
        self.max_keypoints = max_keypoints
        if params is None and checkpoint_path:
            params = convert_torch_checkpoint(checkpoint_path)
        self.params = params

    def init_random(self, h: int = 64, w: int = 64, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3))
        )["params"]
        return self

    def __call__(self, image: jnp.ndarray) -> D2NetFeatures:
        """image: (H, W, 3) RGB float32 in [0, 1], H and W divisible by 4.

        Caffe-style normalization as in the reference preprocessing
        (d2net.py preprocess_image: RGB*255 - mean, BGR is NOT flipped for
        the torch hub checkpoint).
        """
        mean = jnp.asarray([103.939, 116.779, 123.68])
        x = image[None] * 255.0 - mean
        feat = self.net.apply({"params": self.params}, x)
        return _postprocess(feat, self.max_keypoints)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

_TORCH_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]


def convert_torch_checkpoint(path: str):
    """d2 .pth checkpoint (torch {'model': state_dict}) -> flax params."""
    import torch

    payload = torch.load(path, map_location="cpu")
    sd = payload.get("model", payload)
    params = {}
    for i in _TORCH_IDXS:
        w = sd[f"dense_feature_extraction.model.{i}.weight"].numpy()
        b = sd[f"dense_feature_extraction.model.{i}.bias"].numpy()
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    return jax.tree_util.tree_map(jnp.asarray, params)
