"""LoFTR detector-free dense matcher in Flax.

TPU-native port of the LoFTR the reference wraps through kornia
(gtsfm/frontend/matcher/loftr.py:28). Architecture per the paper / kornia
implementation:

  backbone     ResNet-style FPN: coarse features at 1/8 (256-d), fine
               features at 1/2 (128-d)
  pos. enc.    2D sinusoidal added to coarse features
  coarse LoFTR 4 alternating self/cross LINEAR-attention layers (8 heads,
               elu(x)+1 feature map — O(N) in the 1/8-grid token count, which
               is what makes 100+x140 coarse grids feasible)
  coarse match dual-softmax over the score matrix / temperature 0.1, mutual
               max + confidence > 0.2 -> top-K fixed-size match set (masked)
  fine module  5x5 windows from the 1/2-scale features around each coarse
               match, one self/cross attention layer, center-vector
               correlation -> softmax heatmap -> expectation (subpixel)

Static shapes throughout: the coarse stage emits exactly ``max_matches``
matches with a validity mask. Output coordinate convention matches the
reference's image-correspondence generators: per-pair keypoint arrays,
aggregated across pairs by gtsfm_tpu/frontend/aggregator.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

D_COARSE = 256
D_FINE = 128
NUM_HEADS = 8
COARSE_LAYERS = 4
WINDOW = 5
DUAL_SOFTMAX_TEMP = 0.1
CONF_THRESH = 0.2


class ConvBNRelu(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride), name="conv")(x)
        return nn.relu(x)


class Backbone(nn.Module):
    """Reduced ResNet-FPN: 1/2 fine (128-d) + 1/8 coarse (256-d)."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        c1 = ConvBNRelu(64, 2, name="c1a")(x)
        c1 = ConvBNRelu(64, name="c1b")(c1)  # 1/2
        c2 = ConvBNRelu(96, 2, name="c2a")(c1)
        c2 = ConvBNRelu(96, name="c2b")(c2)  # 1/4
        c3 = ConvBNRelu(128, 2, name="c3a")(c2)
        c3 = ConvBNRelu(128, name="c3b")(c3)  # 1/8
        coarse = nn.Conv(D_COARSE, (1, 1), name="coarse_out")(c3)

        # FPN top-down for fine features at 1/2.
        def up2(t, hw):
            B = t.shape[0]
            return jax.image.resize(t, (B, hw[0], hw[1], t.shape[-1]), "bilinear")

        p2 = nn.Conv(96, (1, 1), name="lat2")(c2) + up2(
            nn.Conv(96, (1, 1), name="top3")(c3), c2.shape[1:3]
        )
        p1 = nn.Conv(64, (1, 1), name="lat1")(c1) + up2(
            nn.Conv(64, (1, 1), name="top2")(p2), c1.shape[1:3]
        )
        fine = nn.Conv(D_FINE, (3, 3), name="fine_out")(p1)
        return coarse, fine


def positional_encoding_2d(h: int, w: int, d: int) -> jnp.ndarray:
    """Sinusoidal 2D PE (d/4 frequencies per axis/phase)."""
    d4 = d // 4
    freqs = jnp.exp(jnp.arange(d4) * (-np.log(10000.0) / d4))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * freqs[None]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None] * freqs[None]
    pe_y = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], -1)  # (h, d/2)
    pe_x = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], -1)  # (w, d/2)
    pe = jnp.concatenate(
        [
            jnp.broadcast_to(pe_y[:, None, :], (h, w, d4 * 2)),
            jnp.broadcast_to(pe_x[None, :, :], (h, w, d4 * 2)),
        ],
        axis=-1,
    )
    return pe  # (h, w, d)


def linear_attention(q, k, v, kv_mask):
    """elu+1 kernelized attention (LoFTR's O(N) attention).

    q, k, v: (B, N, H, Dh); kv_mask (B, N)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    k = k * kv_mask[:, :, None, None]
    kv = jnp.einsum("bnhd,bnhe->bhde", k, v)  # (B, H, Dh, Dv)
    z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, jnp.sum(k, axis=1)) + 1e-6)
    return jnp.einsum("bnhd,bhde,bnh->bnhe", q, kv, z)


class LoFTRAttentionLayer(nn.Module):
    d_model: int

    @nn.compact
    def __call__(self, x, source, source_mask):
        dh = self.d_model // NUM_HEADS
        B, N, _ = x.shape

        def split(t):
            return t.reshape(B, -1, NUM_HEADS, dh)

        q = split(nn.Dense(self.d_model, name="q_proj")(x))
        k = split(nn.Dense(self.d_model, name="k_proj")(source))
        v = split(nn.Dense(self.d_model, name="v_proj")(source))
        msg = linear_attention(q, k, v, source_mask).reshape(B, N, self.d_model)
        msg = nn.Dense(self.d_model, name="merge")(jnp.concatenate([x, msg], -1))
        msg = nn.LayerNorm(name="norm1", use_fast_variance=False)(msg)
        y = jnp.concatenate([x, msg], -1)
        y = nn.Dense(2 * self.d_model, name="mlp1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, name="mlp2")(y)
        y = nn.LayerNorm(name="norm2", use_fast_variance=False)(y)
        return x + y


class CoarseTransformer(nn.Module):
    @nn.compact
    def __call__(self, f0, f1, m0, m1):
        for i in range(COARSE_LAYERS):
            self_l = LoFTRAttentionLayer(D_COARSE, name=f"self{i}")
            f0 = self_l(f0, f0, m0)
            f1 = self_l(f1, f1, m1)
            cross_l = LoFTRAttentionLayer(D_COARSE, name=f"cross{i}")
            f0n = cross_l(f0, f1, m1)
            f1n = cross_l(f1, f0, m0)
            f0, f1 = f0n, f1n
        return f0, f1


class FineTransformer(nn.Module):
    @nn.compact
    def __call__(self, w0, w1):  # (M, 25, 128) windows
        ones = jnp.ones(w0.shape[:2])
        layer_s = LoFTRAttentionLayer(D_FINE, name="self0")
        w0 = layer_s(w0, w0, ones)
        w1 = layer_s(w1, w1, ones)
        layer_c = LoFTRAttentionLayer(D_FINE, name="cross0")
        w0n = layer_c(w0, w1, ones)
        w1n = layer_c(w1, w0, ones)
        return w0n, w1n


class LoFTRMatches(NamedTuple):
    kpts0: jnp.ndarray  # (K, 2) pixel coords in image 0
    kpts1: jnp.ndarray  # (K, 2) subpixel coords in image 1
    confidence: jnp.ndarray  # (K,)
    mask: jnp.ndarray  # (K,)


class LoFTRNet(nn.Module):
    max_matches: int = 1024

    @nn.compact
    def __call__(self, img0, img1):  # (H, W) grayscale in [0,1]; H,W % 8 == 0
        H, W = img0.shape
        bb = Backbone(name="backbone")
        c0, f0 = bb(img0[None, :, :, None])
        c1, f1 = bb(img1[None, :, :, None])
        hc, wc = c0.shape[1:3]

        pe = positional_encoding_2d(hc, wc, D_COARSE)
        t0 = (c0[0] + pe).reshape(1, hc * wc, D_COARSE)
        t1 = (c1[0] + pe).reshape(1, hc * wc, D_COARSE)
        ones = jnp.ones((1, hc * wc))
        t0, t1 = CoarseTransformer(name="coarse")(t0, t1, ones, ones)

        # Dual-softmax coarse matching.
        t0n = t0[0] / jnp.maximum(jnp.linalg.norm(t0[0], axis=-1, keepdims=True), 1e-6)
        t1n = t1[0] / jnp.maximum(jnp.linalg.norm(t1[0], axis=-1, keepdims=True), 1e-6)
        S = (t0n @ t1n.T) / DUAL_SOFTMAX_TEMP  # (N0, N1)
        P = jax.nn.softmax(S, axis=0) * jax.nn.softmax(S, axis=1)
        best1 = jnp.argmax(P, axis=1)  # per token in image 0
        conf = jnp.max(P, axis=1)
        best0 = jnp.argmax(P, axis=0)
        mutual = best0[best1] == jnp.arange(hc * wc)
        conf = jnp.where(mutual & (conf > CONF_THRESH), conf, 0.0)

        K = min(self.max_matches, hc * wc)
        top_conf, top_idx0 = jax.lax.top_k(conf, K)
        top_idx1 = best1[top_idx0]
        mask = (top_conf > 0).astype(jnp.float32)

        # Coarse pixel coords (cell centers at stride 8).
        def grid_xy(idx):
            return jnp.stack(
                [(idx % wc).astype(jnp.float32) * 8 + 4,
                 (idx // wc).astype(jnp.float32) * 8 + 4], -1
            )

        k0 = grid_xy(top_idx0)
        k1_coarse = grid_xy(top_idx1)

        # Fine refinement: 5x5 windows in the 1/2-scale feature maps.
        def window(feat, centers):
            r = WINDOW // 2
            offs = jnp.stack(
                jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"),
                -1,
            ).reshape(-1, 2)  # (25, 2) (dy, dx)
            cy = centers[:, 1:2] / 2.0  # to 1/2-scale coords
            cx = centers[:, 0:1] / 2.0
            ys = jnp.clip(cy + offs[None, :, 0], 0, feat.shape[0] - 1).astype(jnp.int32)
            xs = jnp.clip(cx + offs[None, :, 1], 0, feat.shape[1] - 1).astype(jnp.int32)
            return feat[ys, xs]  # (K, 25, D_FINE)

        w0 = window(f0[0], k0)
        w1 = window(f1[0], k1_coarse)
        w0, w1 = FineTransformer(name="fine")(w0, w1)

        center = w0[:, (WINDOW * WINDOW) // 2]  # (K, D)
        sim = jnp.einsum("kd,kpd->kp", center, w1) / (D_FINE**0.5)
        heat = jax.nn.softmax(sim, axis=-1).reshape(-1, WINDOW, WINDOW)
        ys = jnp.sum(heat * jnp.arange(WINDOW)[None, :, None], axis=(1, 2)) - WINDOW // 2
        xs = jnp.sum(heat * jnp.arange(WINDOW)[None, None, :], axis=(1, 2)) - WINDOW // 2
        k1_fine = k1_coarse + jnp.stack([xs, ys], -1) * 2.0  # back to full-res px

        pad = self.max_matches - K
        def padk(t):
            return jnp.concatenate([t, jnp.zeros((pad,) + t.shape[1:], t.dtype)])

        return LoFTRMatches(
            kpts0=padk(k0 * mask[:, None]), kpts1=padk(k1_fine * mask[:, None]),
            confidence=padk(top_conf * mask), mask=padk(mask),
        )


class LoFTR:
    """Wrapper: params + jitted matcher for one image pair."""

    def __init__(self, params=None, max_matches: int = 1024,
                 checkpoint_path: str | None = None):
        self.net = LoFTRNet(max_matches=max_matches)
        if params is None and checkpoint_path:
            raise NotImplementedError(
                "kornia LoFTR checkpoint conversion pending weight validation"
            )
        self.params = params

    def init_random(self, h: int = 64, w: int = 64, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((h, w)), jnp.zeros((h, w))
        )["params"]
        return self

    @functools.partial(jax.jit, static_argnames=("self",))
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> LoFTRMatches:
        return self.net.apply({"params": self.params}, img0, img1)
