"""DISK detector+descriptor (U-Net) in Flax.

TPU-native replacement for the torch DISK the reference wraps
(gtsfm/frontend/detector_descriptor/disk.py:23, which instantiates the
kornia/LightGlue DISK — "DISK: Learning local features with policy
gradient", Tyszkiewicz et al., NeurIPS 2020). Architecture per the paper's
released model: a thin U-Net (5x5 convs, PReLU gates, instance norm,
down channels [16,32,64,64,64], up channels [64,64,64]) emitting a
129-channel map = 128-d descriptors + 1 detection heatmap; keypoints are
heatmap local maxima (5x5 NMS window as in the reference extract()).

Fixed-shape post-processing: top-k over the NMS'd heatmap instead of
threshold-gather. The weight converter maps the kornia state-dict layout;
random init is used in tests (no checkpoints ship in this environment).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DiskFeatures(NamedTuple):
    uv: jnp.ndarray  # (K, 2) pixel coords (u=x, v=y)
    response: jnp.ndarray  # (K,)
    descriptor: jnp.ndarray  # (K, 128) L2-normalized
    mask: jnp.ndarray  # (K,)


class _ConvBlock(nn.Module):
    """norm -> gate(PReLU) -> 5x5 conv, the DISK 'thin' block."""

    features: int
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x, first: bool = False):
        if not first:
            # Instance norm (no learned affine in the DISK release).
            mu = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mu) / jnp.sqrt(var + 1e-5)
            alpha = self.param("prelu", nn.initializers.constant(0.25), (x.shape[-1],))
            x = jnp.where(x >= 0, x, alpha * x)
        return nn.Conv(self.features, (5, 5), name="conv")(x)


class DiskUnet(nn.Module):
    """Thin U-Net: down path with avg-pool, up path with nearest upsample +
    skip concat. Output channels = desc_dim + 1."""

    down: Sequence[int] = (16, 32, 64, 64, 64)
    up: Sequence[int] = (64, 64, 64)
    desc_dim: int = 128

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3); H, W divisible by 16
        skips = []
        y = x
        for i, ch in enumerate(self.down):
            if i > 0:
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
            y = _ConvBlock(ch, name=f"down_{i}")(y, first=(i == 0))
            skips.append(y)
        for j, ch in enumerate(list(self.up) + [self.desc_dim + 1]):
            B, H, W, C = y.shape
            y = jax.image.resize(y, (B, 2 * H, 2 * W, C), "nearest")
            y = jnp.concatenate([y, skips[len(self.down) - 2 - j]], axis=-1)
            y = _ConvBlock(ch, name=f"up_{j}")(y)
        return y  # (B, H, W, desc_dim + 1)


def nms_window(scores: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    maxed = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max, (window, window), (1, 1), "SAME"
    )
    return jnp.where(scores == maxed, scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_window_size"))
def _postprocess(out, max_keypoints: int, nms_window_size: int = 5):
    f = out[0]
    desc_grid = f[..., :-1]
    heat = f[..., -1]
    H, W = heat.shape
    nms = nms_window(heat, nms_window_size)
    vals, idx = jax.lax.top_k(nms.reshape(-1), max_keypoints)
    ok = jnp.isfinite(vals) & (vals > 0.0)
    yi = (idx // W).astype(jnp.int32)
    xi = (idx % W).astype(jnp.int32)
    desc = desc_grid[yi, xi]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    uv = jnp.stack([xi.astype(jnp.float32), yi.astype(jnp.float32)], -1)
    mask = ok.astype(jnp.float32)
    return DiskFeatures(
        uv=uv * mask[:, None],
        response=jnp.where(ok, vals, 0.0),
        descriptor=desc * mask[:, None],
        mask=mask,
    )


class Disk:
    """Stateful wrapper: params + jitted apply."""

    def __init__(self, params=None, max_keypoints: int = 2048,
                 checkpoint_path: str | None = None):
        self.net = DiskUnet()
        self.max_keypoints = max_keypoints
        if params is None and checkpoint_path:
            params = convert_torch_checkpoint(checkpoint_path)
        self.params = params

    def init_random(self, h: int = 64, w: int = 64, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3))
        )["params"]
        return self

    def __call__(self, image: jnp.ndarray) -> DiskFeatures:
        """image: (H, W, 3) RGB float32 in [0, 1]; H, W divisible by 16."""
        out = self.net.apply({"params": self.params}, image[None])
        return _postprocess(out, self.max_keypoints)


def convert_torch_checkpoint(path: str):
    """kornia/upstream DISK checkpoint -> flax params (layout-based mapping:
    torch convs in module order pair off with down_0..down_4, up_0..up_3;
    PReLU slopes likewise). Conv weight (O, I, kh, kw) -> (kh, kw, I, O)."""
    import torch

    payload = torch.load(path, map_location="cpu")
    sd = payload.get("extractor", payload.get("model", payload))
    convs = [(k, v) for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4]
    prelus = [(k, v) for k, v in sd.items() if "prelu" in k.lower() or v.ndim == 1 and "weight" in k and v.numel() < 4096 and k.replace("weight", "bias") not in sd]
    names = [f"down_{i}" for i in range(5)] + [f"up_{j}" for j in range(4)]
    if len(convs) != len(names):
        raise ValueError(
            f"unexpected DISK checkpoint layout: {len(convs)} convs, want {len(names)}"
        )
    params: dict = {}
    for name, (wk, w) in zip(names, convs):
        bk = wk.replace("weight", "bias")
        entry = {"conv": {
            "kernel": np.transpose(w.numpy(), (2, 3, 1, 0)),
        }}
        if bk in sd:
            entry["conv"]["bias"] = sd[bk].numpy()
        params[name] = entry
    for name, (pk, p) in zip(names[1:], prelus):  # first block has no gate
        params[name]["prelu"] = p.numpy().reshape(-1)
    return jax.tree_util.tree_map(jnp.asarray, params)
