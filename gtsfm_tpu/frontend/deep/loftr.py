"""LoFTR detector-free dense matcher in Flax.

TPU-native port of the LoFTR the reference wraps through kornia
(gtsfm/frontend/matcher/loftr.py:28). Architecture follows the official
release exactly (weight-convertible):

  backbone     ResNetFPN_8_2: 7x7 s2 stem (128) -> 3 stages of BasicBlocks
               (128 / 196 / 256) -> FPN top-down; coarse 256-d at 1/8, fine
               128-d at 1/2. BatchNorms folded into convs at conversion.
  pos. enc.    interleaved 2D sinusoidal (PositionEncodingSine,
               temp_bug_fix=True layout: channels 0::4 sin x, 1::4 cos x,
               2::4 sin y, 3::4 cos y)
  coarse LoFTR 4x alternating self/cross LINEAR-attention encoder layers
               (8 heads, elu+1 feature map, O(N) in the 1/8 tokens) —
               upstream LoFTREncoderLayer: bias-free q/k/v/merge, norm1,
               bias-free MLP(2d->2d->d) on [x, msg], norm2, residual.
  coarse match dual-softmax / temperature 0.1, mutual max + conf > 0.2 ->
               top-K fixed-size match set (masked)
  fine module  5x5 windows from the 1/2 features around each coarse match,
               fine_preprocess concatenating down-projected coarse features
               (down_proj + merge_feat), one self/cross layer (d=128),
               center-vector correlation -> softmax heatmap -> expectation.

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


class BasicBlock(nn.Module):
    """ResNet BasicBlock, eval-mode BN folded into the convs."""

    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # Explicit torch-style padding: XLA "SAME" pads asymmetrically for
        # stride-2 convs (2,3) where torch pads (3,3)//2 symmetrically.
        s = (self.stride, self.stride)
        p1 = ((1, 1), (1, 1))
        y = nn.relu(nn.Conv(self.ch, (3, 3), strides=s, padding=p1, name="conv1")(x))
        y = nn.Conv(self.ch, (3, 3), padding=p1, name="conv2")(y)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=s, name="downsample")(x)
        return nn.relu(x + y)


class Backbone(nn.Module):
    """ResNetFPN_8_2 (official initial_dim=128, block_dims=[128, 196, 256])."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        x0 = nn.relu(nn.Conv(
            128, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), name="conv1"
        )(x))  # 1/2
        x1 = BasicBlock(128, name="layer1_0")(x0)
        x1 = BasicBlock(128, name="layer1_1")(x1)  # 1/2
        x2 = BasicBlock(196, 2, name="layer2_0")(x1)
        x2 = BasicBlock(196, name="layer2_1")(x2)  # 1/4
        x3 = BasicBlock(256, 2, name="layer3_0")(x2)
        x3 = BasicBlock(256, name="layer3_1")(x3)  # 1/8

        def up2(t, hw):
            B = t.shape[0]
            return jax.image.resize(t, (B, hw[0], hw[1], t.shape[-1]), "bilinear")

        coarse = nn.Conv(256, (1, 1), name="layer3_outconv")(x3)
        x2_out = nn.Conv(256, (1, 1), name="layer2_outconv")(x2)
        x2_out = x2_out + up2(coarse, x2.shape[1:3])
        x2_out = nn.Conv(256, (3, 3), name="layer2_outconv2_0")(x2_out)
        x2_out = nn.leaky_relu(x2_out)
        x2_out = nn.Conv(196, (3, 3), name="layer2_outconv2_1")(x2_out)
        x1_out = nn.Conv(196, (1, 1), name="layer1_outconv")(x1)
        x1_out = x1_out + up2(x2_out, x1.shape[1:3])
        x1_out = nn.Conv(196, (3, 3), name="layer1_outconv2_0")(x1_out)
        x1_out = nn.leaky_relu(x1_out)
        fine = nn.Conv(128, (3, 3), name="layer1_outconv2_1")(x1_out)
        return coarse, fine


def positional_encoding_2d(h: int, w: int, d: int) -> jnp.ndarray:
    """Interleaved sinusoidal 2D PE (upstream PositionEncodingSine,
    temp_bug_fix=True): channels 0::4 sin(x), 1::4 cos(x), 2::4 sin(y),
    3::4 cos(y); positions 1-based (cumsum of ones)."""
    d4 = d // 4
    div = jnp.exp(jnp.arange(d4) * 2.0 * (-np.log(10000.0) / (d // 2)))
    ys = (jnp.arange(h, dtype=jnp.float32) + 1.0)[:, None] * div[None]  # (h, d4)
    xs = (jnp.arange(w, dtype=jnp.float32) + 1.0)[:, None] * div[None]  # (w, d4)
    pe = jnp.zeros((h, w, d))
    pe = pe.at[..., 0::4].set(jnp.broadcast_to(jnp.sin(xs)[None, :, :], (h, w, d4)))
    pe = pe.at[..., 1::4].set(jnp.broadcast_to(jnp.cos(xs)[None, :, :], (h, w, d4)))
    pe = pe.at[..., 2::4].set(jnp.broadcast_to(jnp.sin(ys)[:, None, :], (h, w, d4)))
    pe = pe.at[..., 3::4].set(jnp.broadcast_to(jnp.cos(ys)[:, None, :], (h, w, d4)))
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
    """Upstream LoFTREncoderLayer: bias-free projections, message-only merge."""

    d_model: int

    @nn.compact
    def __call__(self, x, source, source_mask):
        dh = self.d_model // NUM_HEADS
        B, N, _ = x.shape

        def split(t):
            return t.reshape(B, -1, NUM_HEADS, dh)

        q = split(nn.Dense(self.d_model, use_bias=False, name="q_proj")(x))
        k = split(nn.Dense(self.d_model, use_bias=False, name="k_proj")(source))
        v = split(nn.Dense(self.d_model, use_bias=False, name="v_proj")(source))
        msg = linear_attention(q, k, v, source_mask).reshape(B, N, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1", use_fast_variance=False)(msg)
        y = jnp.concatenate([x, msg], -1)
        y = nn.Dense(2 * self.d_model, use_bias=False, name="mlp0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, name="mlp2")(y)
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

        # Fine preprocess: 5x5 windows in the 1/2-scale maps, concatenated
        # with down-projected coarse features (upstream FinePreprocess with
        # cat_c_feat: down_proj + merge_feat).
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
        down_proj = nn.Dense(D_FINE, name="down_proj")
        merge_feat = nn.Dense(D_FINE, name="merge_feat")
        cf0 = down_proj(t0[0][top_idx0])  # (K, 128)
        cf1 = down_proj(t1[0][top_idx1])
        P25 = WINDOW * WINDOW
        w0 = merge_feat(jnp.concatenate(
            [w0, jnp.broadcast_to(cf0[:, None], (K, P25, D_FINE))], -1))
        w1 = merge_feat(jnp.concatenate(
            [w1, jnp.broadcast_to(cf1[:, None], (K, P25, D_FINE))], -1))
        w0, w1 = FineTransformer(name="fine")(w0, w1)

        center = w0[:, P25 // 2]  # (K, D)
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
            params = convert_torch_checkpoint(checkpoint_path)
        self.params = params

    def init_random(self, h: int = 64, w: int = 64, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((h, w)), jnp.zeros((h, w))
        )["params"]
        return self

    @functools.partial(jax.jit, static_argnames=("self",))
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> LoFTRMatches:
        return self.net.apply({"params": self.params}, img0, img1)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (official outdoor_ds.ckpt / kornia layout)
# ---------------------------------------------------------------------------


def convert_torch_checkpoint(path: str):
    """Official LoFTR checkpoint -> flax params.

    Handles both raw state dicts and lightning checkpoints ({'state_dict':
    {'matcher.xxx': ...}}). Eval-mode BatchNorms are folded into the
    preceding convs; torch conv (O, I, kh, kw) -> flax (kh, kw, I, O);
    torch Linear (O, I) -> flax Dense kernel (I, O).
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("matcher."): v for k, v in sd.items()}

    def conv(prefix, bn_prefix=None):
        w = sd[f"{prefix}.weight"].numpy()
        o = w.shape[0]
        b = sd[f"{prefix}.bias"].numpy() if f"{prefix}.bias" in sd else np.zeros(o, np.float32)
        if bn_prefix is not None:
            gamma = sd[f"{bn_prefix}.weight"].numpy()
            beta = sd[f"{bn_prefix}.bias"].numpy()
            mean = sd[f"{bn_prefix}.running_mean"].numpy()
            var = sd[f"{bn_prefix}.running_var"].numpy()
            s = gamma / np.sqrt(var + 1e-5)
            w = w * s[:, None, None, None]
            b = (b - mean) * s + beta
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}

    def dense(prefix, bias=True):
        out = {"kernel": np.transpose(sd[f"{prefix}.weight"].numpy(), (1, 0))}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"].numpy()
        return out

    def block(prefix):
        p = {
            "conv1": conv(f"{prefix}.conv1", f"{prefix}.bn1"),
            "conv2": conv(f"{prefix}.conv2", f"{prefix}.bn2"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = conv(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
        return p

    bb = {
        "conv1": conv("backbone.conv1", "backbone.bn1"),
        "layer3_outconv": conv("backbone.layer3_outconv"),
        "layer2_outconv": conv("backbone.layer2_outconv"),
        "layer2_outconv2_0": conv("backbone.layer2_outconv2.0", "backbone.layer2_outconv2.1"),
        "layer2_outconv2_1": conv("backbone.layer2_outconv2.3"),
        "layer1_outconv": conv("backbone.layer1_outconv"),
        "layer1_outconv2_0": conv("backbone.layer1_outconv2.0", "backbone.layer1_outconv2.1"),
        "layer1_outconv2_1": conv("backbone.layer1_outconv2.3"),
    }
    for li, name in ((1, "layer1"), (2, "layer2"), (3, "layer3")):
        for bi in (0, 1):
            bb[f"{name}_{bi}"] = block(f"backbone.{name}.{bi}")

    def enc_layer(prefix, d):
        return {
            "q_proj": dense(f"{prefix}.q_proj", bias=False),
            "k_proj": dense(f"{prefix}.k_proj", bias=False),
            "v_proj": dense(f"{prefix}.v_proj", bias=False),
            "merge": dense(f"{prefix}.merge", bias=False),
            "mlp0": dense(f"{prefix}.mlp.0", bias=False),
            "mlp2": dense(f"{prefix}.mlp.2", bias=False),
            "norm1": {"scale": sd[f"{prefix}.norm1.weight"].numpy(),
                      "bias": sd[f"{prefix}.norm1.bias"].numpy()},
            "norm2": {"scale": sd[f"{prefix}.norm2.weight"].numpy(),
                      "bias": sd[f"{prefix}.norm2.bias"].numpy()},
        }

    coarse = {}
    for i in range(COARSE_LAYERS):
        coarse[f"self{i}"] = enc_layer(f"loftr_coarse.layers.{2 * i}", D_COARSE)
        coarse[f"cross{i}"] = enc_layer(f"loftr_coarse.layers.{2 * i + 1}", D_COARSE)
    fine = {
        "self0": enc_layer("loftr_fine.layers.0", D_FINE),
        "cross0": enc_layer("loftr_fine.layers.1", D_FINE),
    }
    params = {
        "backbone": bb,
        "coarse": coarse,
        "fine": fine,
        "down_proj": dense("fine_preprocess.down_proj"),
        "merge_feat": dense("fine_preprocess.merge_feat"),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)
