"""SuperGlue attention matcher in Flax.

TPU-native replacement for the torch SuperGlue the reference wraps
(gtsfm/frontend/matcher/superglue_matcher.py:28; model at
thirdparty/SuperGluePretrainedNetwork/models/superglue.py:177). Same
architecture: keypoint-position MLP encoder -> 9 alternating self/cross
multi-head attention layers (4 heads, 256-d, AttentionalGNN :122) ->
final projection -> inner-product score / sqrt(d) -> Sinkhorn optimal
transport with a learned dustbin (log_optimal_transport :150, 20 iterations
DEFAULT_NUM_SINKHORN_ITERATIONS, superglue_matcher.py:25) -> mutual-max +
score threshold match extraction.

Static-shape: keypoint sets are padded with masks; masked slots get -inf
attention and -inf transport scores so they can only match the dustbin.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

D_MODEL = 256
NUM_HEADS = 4
NUM_GNN_LAYERS = 9  # x2 (self + cross)
SINKHORN_ITERS = 20
NEG = -1e9


class KeypointEncoder(nn.Module):
    """MLP on (x, y, score) -> 256, added to the visual descriptor
    (superglue.py KeypointEncoder: layers [3, 32, 64, 128, 256])."""

    @nn.compact
    def __call__(self, kpts_norm, scores):
        x = jnp.concatenate([kpts_norm, scores[..., None]], axis=-1)  # (B, K, 3)
        # Upstream interleaves eval-mode BatchNorm1d; it folds EXACTLY into
        # the preceding conv at weight conversion, so the flax graph is plain
        # Dense -> relu.
        for i, ch in enumerate([32, 64, 128, 256]):
            x = nn.Dense(ch, name=f"dense{i}")(x)
            if i < 3:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    @nn.compact
    def __call__(self, q_in, kv_in, kv_mask):
        d_head = D_MODEL // NUM_HEADS
        q = nn.Dense(D_MODEL, name="q")(q_in)
        k = nn.Dense(D_MODEL, name="k")(kv_in)
        v = nn.Dense(D_MODEL, name="v")(kv_in)

        def split(x):
            return x.reshape(x.shape[:-1] + (NUM_HEADS, d_head))

        q, k, v = split(q), split(k), split(v)
        # (B, K, H, Dh) -> (B*H, K, Dh) for the flash kernel dispatcher
        # (Pallas online-softmax on TPU for large K, einsum fallback).
        from gtsfm_tpu.ops.pallas_kernels.attention import masked_attention

        B, K = q.shape[0], q.shape[1]
        def flat(t):
            return t.transpose(0, 2, 1, 3).reshape(B * NUM_HEADS, -1, d_head)

        mask_rep = jnp.repeat(kv_mask, NUM_HEADS, axis=0)
        out = masked_attention(flat(q), flat(k), flat(v), mask_rep)
        out = out.reshape(B, NUM_HEADS, K, d_head).transpose(0, 2, 1, 3)
        out = out.reshape(B, K, D_MODEL).astype(q_in.dtype)
        return nn.Dense(D_MODEL, name="merge")(out)


class AttentionalLayer(nn.Module):
    @nn.compact
    def __call__(self, x, source, source_mask):
        msg = MultiHeadAttention(name="attn")(x, source, source_mask)
        y = jnp.concatenate([x, msg], axis=-1)
        for i, ch in enumerate([512, 256]):
            y = nn.Dense(ch, name=f"mlp{i}")(y)
            if i == 0:
                y = nn.relu(y)  # BN folded into mlp0 at conversion
        return x + y


class SuperGlueNet(nn.Module):
    @nn.compact
    def __call__(self, desc0, desc1, kpts0n, kpts1n, sc0, sc1, mask0, mask1):
        enc = KeypointEncoder(name="kenc")
        x0 = desc0 + enc(kpts0n, sc0)
        x1 = desc1 + enc(kpts1n, sc1)
        for layer in range(NUM_GNN_LAYERS):
            self_l = AttentionalLayer(name=f"self{layer}")
            x0 = self_l(x0, x0, mask0)
            x1 = self_l(x1, x1, mask1)
            cross_l = AttentionalLayer(name=f"cross{layer}")
            x0n = cross_l(x0, x1, mask1)
            x1n = cross_l(x1, x0, mask0)
            x0, x1 = x0n, x1n
        final_proj = nn.Dense(D_MODEL, name="final_proj")  # shared (upstream has one)
        m0 = final_proj(x0)
        m1 = final_proj(x1)
        scores = jnp.einsum("bkd,bld->bkl", m0, m1) / (D_MODEL**0.25) ** 2
        return scores


def log_sinkhorn(scores, mask0, mask1, bin_score, iters: int = SINKHORN_ITERS):
    """Log-domain Sinkhorn with dustbin row/col (superglue.py:150).

    scores: (B, K0, K1); masked slots get -inf so all their mass goes to the
    dustbin. Returns log assignment matrix (B, K0+1, K1+1).
    """
    B, K0, K1 = scores.shape
    scores = jnp.where(mask0[:, :, None] > 0, scores, NEG)
    scores = jnp.where(mask1[:, None, :] > 0, scores, NEG)

    bins0 = jnp.full((B, K0, 1), bin_score)
    bins1 = jnp.full((B, 1, K1), bin_score)
    bin00 = jnp.full((B, 1, 1), bin_score)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1), jnp.concatenate([bins1, bin00], -1)], 1
    )  # (B, K0+1, K1+1)

    n0 = jnp.sum(mask0, -1)  # live counts
    n1 = jnp.sum(mask1, -1)
    # Marginals: each live keypoint mass 1, dustbin absorbs the difference.
    log_mu = jnp.concatenate(
        [jnp.where(mask0 > 0, 0.0, NEG), jnp.log(jnp.maximum(n1, 1.0))[:, None]], -1
    )
    log_nu = jnp.concatenate(
        [jnp.where(mask1 > 0, 0.0, NEG), jnp.log(jnp.maximum(n0, 1.0))[:, None]], -1
    )
    norm = -jnp.log(jnp.maximum(n0 + n1, 1.0))[:, None]
    log_mu = log_mu + norm
    log_nu = log_nu + norm

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (u, v), None, length=iters)
    return couplings + u[:, :, None] + v[:, None, :] - norm[..., None]


def extract_matches(log_assign, mask0, mask1, match_threshold: float = 0.2):
    """Mutual-max + threshold on exp(log_assign) (superglue.py forward tail).

    Returns (match_idx (B, K0) into image1 or -1, match_mask (B, K0))."""
    Z = log_assign[:, :-1, :-1]
    best12 = jnp.argmax(Z, axis=2)
    best21 = jnp.argmax(Z, axis=1)
    k_ids = jnp.arange(Z.shape[1])[None, :]
    mutual = jnp.take_along_axis(best21, best12, axis=1) == k_ids
    score = jnp.exp(jnp.take_along_axis(Z, best12[..., None], axis=2)[..., 0])
    ok = mutual & (score > match_threshold) & (mask0 > 0)
    tgt_live = jnp.take_along_axis(mask1, best12, axis=1) > 0
    ok = ok & tgt_live
    return jnp.where(ok, best12, -1).astype(jnp.int32), ok.astype(jnp.float32)


class SuperGlue:
    """Params + jitted matcher over padded keypoint batches."""

    def __init__(self, params=None, bin_score: float = 2.3268,
                 match_threshold: float = 0.2, checkpoint_path: str | None = None):
        self.net = SuperGlueNet()
        self.match_threshold = match_threshold
        self._bin_score = bin_score
        if params is None and checkpoint_path:
            params, bin_val = convert_torch_checkpoint(checkpoint_path)
            self._bin_score = bin_val
        self.params = params

    def init_random(self, k: int = 64, seed: int = 0):
        z = jnp.zeros((1, k, D_MODEL))
        zk = jnp.zeros((1, k, 2))
        zs = jnp.zeros((1, k))
        self.params = self.net.init(
            jax.random.PRNGKey(seed), z, z, zk, zk, zs, zs, zs + 1, zs + 1
        )["params"]
        return self

    @functools.partial(jax.jit, static_argnames=("self",))
    def _run(self, desc0, desc1, kpts0n, kpts1n, sc0, sc1, mask0, mask1):
        scores = self.net.apply(
            {"params": self.params}, desc0, desc1, kpts0n, kpts1n, sc0, sc1, mask0, mask1
        )
        log_assign = log_sinkhorn(scores, mask0, mask1, self._bin_score)
        return extract_matches(log_assign, mask0, mask1, self.match_threshold)

    def __call__(self, desc0, desc1, kpts0, kpts1, sc0, sc1, mask0, mask1,
                 image_shape0, image_shape1):
        """All inputs batched (B, K, ...). kpts in pixels; image_shape (h, w)
        normalizes them (superglue.py normalize_keypoints)."""
        def norm_kpts(kpts, shape):
            h, w = shape
            size = jnp.asarray([w, h], jnp.float32)
            center = size / 2.0
            scale = jnp.max(size) * 0.7
            return (kpts - center) / scale

        k0n = norm_kpts(kpts0, image_shape0)
        k1n = norm_kpts(kpts1, image_shape1)
        return self._run(desc0, desc1, k0n, k1n, sc0, sc1, mask0, mask1)


def convert_torch_checkpoint(path: str):
    """superglue_{indoor,outdoor}.pth -> (flax params, bin_score).

    Upstream uses Conv1d everywhere (kernel (O, I, 1)); flax Dense kernel is
    (I, O). Name mapping documented inline for auditability.
    """
    import torch

    sd = torch.load(path, map_location="cpu")

    def dense(prefix):
        w = sd[f"{prefix}.weight"].numpy()
        if w.ndim == 3:
            w = w[..., 0]
        return {"kernel": np.transpose(w, (1, 0)), "bias": sd[f"{prefix}.bias"].numpy()}

    params: dict[str, Any] = {}

    # Keypoint encoder: kenc.encoder = Sequential(Conv1d, BN, ReLU, ...) with
    # indices 0,1 / 3,4 / 6,7 / 9 (last layer no BN).
    kenc = {}
    conv_idx = [0, 3, 6, 9]
    for i, ci in enumerate(conv_idx):
        d = dense(f"kenc.encoder.{ci}")
        if i < 3:
            # Fold eval-mode BatchNorm into the preceding conv:
            bn = f"kenc.encoder.{ci + 1}"
            gamma = sd[f"{bn}.weight"].numpy()
            beta = sd[f"{bn}.bias"].numpy()
            mean = sd[f"{bn}.running_mean"].numpy()
            var = sd[f"{bn}.running_var"].numpy()
            s = gamma / np.sqrt(var + 1e-5)
            d = {
                "kernel": d["kernel"] * s[None, :],
                "bias": (d["bias"] - mean) * s + beta,
            }
            kenc[f"dense{i}"] = d
        else:
            kenc[f"dense{i}"] = d
    params["kenc"] = kenc

    for layer in range(NUM_GNN_LAYERS):
        for kind, name in (("self", f"self{layer}"), ("cross", f"cross{layer}")):
            gidx = 2 * layer + (0 if kind == "self" else 1)
            base = f"gnn.layers.{gidx}"
            attn = {
                "q": dense(f"{base}.attn.proj.0"),
                "k": dense(f"{base}.attn.proj.1"),
                "v": dense(f"{base}.attn.proj.2"),
                "merge": dense(f"{base}.attn.merge"),
            }
            mlp = {
                "mlp0": dense(f"{base}.mlp.0"),
                "mlp1": dense(f"{base}.mlp.3"),
            }
            bn = f"{base}.mlp.1"
            gamma = sd[f"{bn}.weight"].numpy()
            beta = sd[f"{bn}.bias"].numpy()
            mean = sd[f"{bn}.running_mean"].numpy()
            var = sd[f"{bn}.running_var"].numpy()
            s = gamma / np.sqrt(var + 1e-5)
            mlp["mlp0"] = {
                "kernel": mlp["mlp0"]["kernel"] * s[None, :],
                "bias": (mlp["mlp0"]["bias"] - mean) * s + beta,
            }
            params[name] = {"attn": attn, **mlp}

    params["final_proj"] = dense("final_proj")
    bin_score = float(sd["bin_score"].numpy())
    return jax.tree_util.tree_map(jnp.asarray, params), bin_score
