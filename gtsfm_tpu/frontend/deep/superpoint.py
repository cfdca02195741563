"""SuperPoint detector/descriptor in Flax.

TPU-native replacement for the torch SuperPoint the reference wraps
(gtsfm/frontend/detector_descriptor/superpoint.py:30; model at
thirdparty/SuperGluePretrainedNetwork/models/superpoint.py:95). Same
architecture: shared VGG-style encoder -> 65-channel cell softmax heatmap
(8x8 cells + dustbin) + 256-d descriptor grid; maxpool NMS (simple_nms :47);
top-k selection; bilinear descriptor sampling (sample_descriptors :80).

Everything static-shape: top-k replaces threshold-then-gather, masked instead
of filtered. Weights load from the upstream ``superpoint_v1.pth`` via
:func:`convert_torch_checkpoint` when available.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SuperPointFeatures(NamedTuple):
    uv: jnp.ndarray  # (K, 2) pixel coords (u=x, v=y)
    response: jnp.ndarray  # (K,)
    descriptor: jnp.ndarray  # (K, 256) L2-normalized
    mask: jnp.ndarray  # (K,)


class SuperPointNet(nn.Module):
    """Encoder + detector/descriptor heads (NHWC)."""

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 1), H, W divisible by 8
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        relu = nn.relu
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        y = relu(nn.Conv(c1, (3, 3), name="conv1a")(x))
        y = relu(nn.Conv(c1, (3, 3), name="conv1b")(y))
        y = pool(y)
        y = relu(nn.Conv(c2, (3, 3), name="conv2a")(y))
        y = relu(nn.Conv(c2, (3, 3), name="conv2b")(y))
        y = pool(y)
        y = relu(nn.Conv(c3, (3, 3), name="conv3a")(y))
        y = relu(nn.Conv(c3, (3, 3), name="conv3b")(y))
        y = pool(y)
        y = relu(nn.Conv(c4, (3, 3), name="conv4a")(y))
        y = relu(nn.Conv(c4, (3, 3), name="conv4b")(y))

        # Detector head: 65 = 8x8 cell pixels + dustbin.
        det = relu(nn.Conv(c5, (3, 3), name="convPa")(y))
        det = nn.Conv(65, (1, 1), name="convPb")(det)  # (B, H/8, W/8, 65)

        # Descriptor head.
        desc = relu(nn.Conv(c5, (3, 3), name="convDa")(y))
        desc = nn.Conv(d1, (1, 1), name="convDb")(desc)  # (B, H/8, W/8, 256)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        return det, desc


def scores_from_logits(det_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, H/8, W/8, 65) -> (B, H, W) per-pixel keypoint probability.

    Softmax over the 65 channels, drop the dustbin, un-cell-shuffle
    (reference superpoint.py forward).
    """
    B, Hc, Wc, _ = det_logits.shape
    probs = jax.nn.softmax(det_logits, axis=-1)[..., :64]  # (B, Hc, Wc, 64)
    probs = probs.reshape(B, Hc, Wc, 8, 8)
    probs = probs.transpose(0, 1, 3, 2, 4)  # (B, Hc, 8, Wc, 8)
    return probs.reshape(B, Hc * 8, Wc * 8)


def simple_nms(scores: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Fast NMS via maxpool equality (reference superpoint.py:47)."""
    size = 2 * radius + 1
    maxed = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max, (1, size, size), (1, 1, 1), "SAME"
    )
    return jnp.where(scores == maxed, scores, 0.0)


def sample_descriptors(desc_grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear descriptor sampling at keypoint locations.

    desc_grid: (Hc, Wc, 256) — cell grid (stride 8, cell centers at 8i+3.5,
    reference sample_descriptors :80). uv: (K, 2) pixel coords.
    """
    Hc, Wc, D = desc_grid.shape
    # Map pixel coords to grid coords.
    gx = (uv[:, 0] - 3.5) / 8.0
    gy = (uv[:, 1] - 3.5) / 8.0
    gx = jnp.clip(gx, 0.0, Wc - 1.001)
    gy = jnp.clip(gy, 0.0, Hc - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    d00 = desc_grid[y0, x0]
    d01 = desc_grid[y0, x0 + 1]
    d10 = desc_grid[y0 + 1, x0]
    d11 = desc_grid[y0 + 1, x0 + 1]
    d = (
        d00 * ((1 - fy) * (1 - fx))[:, None]
        + d01 * ((1 - fy) * fx)[:, None]
        + d10 * (fy * (1 - fx))[:, None]
        + d11 * (fy * fx)[:, None]
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def _postprocess(det_logits, desc_grid, max_keypoints: int, nms_radius: int,
                 keypoint_threshold: float):
    scores = scores_from_logits(det_logits)[0]  # (H, W)
    H, W = scores.shape
    scores = simple_nms(scores[None], nms_radius)[0]
    # Remove border responses (reference remove_borders, 4 px).
    b = 4
    border = jnp.zeros_like(scores).at[b:-b, b:-b].set(1.0)
    scores = scores * border
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    ok = vals > keypoint_threshold
    uv = jnp.stack([(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], -1)
    desc = sample_descriptors(desc_grid[0], uv)
    mask = ok.astype(jnp.float32)
    return SuperPointFeatures(
        uv=uv * mask[:, None], response=vals * mask,
        descriptor=desc * mask[:, None], mask=mask,
    )


class SuperPoint:
    """Stateful wrapper: params + jitted apply (batched over images via vmap
    at the call site if needed)."""

    def __init__(self, params=None, max_keypoints: int = 2048,
                 nms_radius: int = 4, keypoint_threshold: float = 0.005,
                 checkpoint_path: str | None = None):
        self.net = SuperPointNet()
        self.max_keypoints = max_keypoints
        self.nms_radius = nms_radius
        self.keypoint_threshold = keypoint_threshold
        if params is None and checkpoint_path:
            params = convert_torch_checkpoint(checkpoint_path)
        self.params = params

    def init_random(self, h: int = 128, w: int = 128, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 1))
        )["params"]
        return self

    def __call__(self, image: jnp.ndarray) -> SuperPointFeatures:
        """image: (H, W) grayscale float32 in [0, 1]; H, W divisible by 8."""
        x = image[None, :, :, None]
        det, desc = self.net.apply({"params": self.params}, x)
        return _postprocess(
            det, desc, self.max_keypoints, self.nms_radius, self.keypoint_threshold
        )


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

_CONV_NAMES = [
    "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
    "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
]


def convert_torch_checkpoint(path: str):
    """superpoint_v1.pth (torch state dict) -> flax params.

    Torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O).
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    params = {}
    for name in _CONV_NAMES:
        w = sd[f"{name}.weight"].numpy()
        b = sd[f"{name}.bias"].numpy()
        params[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    return jax.tree_util.tree_map(jnp.asarray, params)
