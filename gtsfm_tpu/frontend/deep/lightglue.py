"""LightGlue attention matcher in Flax.

TPU-native replacement for the torch LightGlue the reference wraps
(gtsfm/frontend/matcher/lightglue_matcher.py:24; model at
thirdparty/LightGlue). Architecture per the paper/official repo:

  input projection -> 9 transformer layers, each = self-attention with 2D
  rotary positional encoding (learnable Fourier frequencies) + bidirectional
  cross-attention, both followed by a concat-MLP (LayerNorm + GELU) residual
  update -> per-side linear heads -> double-softmax assignment with learned
  matchability (sigmoid) -> mutual-max + threshold extraction.

Adaptive depth (the original's early exit): per-layer token-confidence heads
predict whether embeddings have converged; when the confident fraction
exceeds ``depth_confidence`` (0.95 default upstream) the remaining layers are
skipped, and the ASSIGNMENT HEAD OF THE EXIT LAYER produces the matches (the
original's per-layer log_assignment list). Here each layer is its own jitted
program and the exit decision is a scalar host sync between layers — static
shapes everywhere, real compute savings.

Adaptive width (the original's point pruning, get_pruning_mask): tokens that
are confident AND unmatchable (matchability <= 1 - width_confidence, 0.99
default upstream) are removed from later layers. With fixed-shape attention
this is realized by host-synced BUCKET COMPACTION: kept tokens are gathered
to the front and the token axis shrinks to the next multiple of 128, so the
remaining layers genuinely run on fewer tokens (bounded recompile set thanks
to the bucket quantization); pruned points are unmatchable, as upstream.

Weight conversion targets the official ``superpoint_lightglue.pth`` layout
(transformers.i.self_attn.Wqkv / cross_attn.to_qk / log_assignment /
token_confidence ...).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

D_MODEL = 256
NUM_HEADS = 4
NUM_LAYERS = 9
NEG = -1e9


def rotary_embed(pos: jnp.ndarray, freqs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2D rotary encoding: pos (B, K, 2) x freqs (2, F) -> cos/sin (B, K, 2F)."""
    proj = jnp.einsum("bkt,tf->bkf", pos, freqs)  # (B, K, F)
    emb = jnp.concatenate([proj, proj], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, K, H, Dh); rotate feature pairs (interleaved halves)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rx = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rx * sin[:, :, None, :]


class FFN(nn.Module):
    """Concat-message MLP: Linear(2d->2d) -> LayerNorm -> GELU -> Linear(2d->d)."""

    @nn.compact
    def __call__(self, x, msg):
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * D_MODEL, name="fc1")(y)
        y = nn.LayerNorm(name="ln", use_fast_variance=False)(y)
        y = nn.gelu(y)
        y = nn.Dense(D_MODEL, name="fc2")(y)
        return x + y


class SelfBlock(nn.Module):
    @nn.compact
    def __call__(self, x, cos, sin, mask):
        dh = D_MODEL // NUM_HEADS
        qkv = nn.Dense(3 * D_MODEL, name="Wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = x.shape[:2] + (NUM_HEADS, dh)
        q, k, v = (t.reshape(shape) for t in (q, k, v))
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        from gtsfm_tpu.ops.pallas_kernels.attention import masked_attention

        B, K = x.shape[0], x.shape[1]
        flat = lambda t: t.transpose(0, 2, 1, 3).reshape(B * NUM_HEADS, K, dh)
        msg = masked_attention(
            flat(q), flat(k), flat(v), jnp.repeat(mask, NUM_HEADS, axis=0)
        )
        msg = msg.reshape(B, NUM_HEADS, K, dh).transpose(0, 2, 1, 3)
        msg = msg.reshape(x.shape[:2] + (D_MODEL,)).astype(x.dtype)
        msg = nn.Dense(D_MODEL, name="out_proj")(msg)
        return FFN(name="ffn")(x, msg)


class CrossBlock(nn.Module):
    @nn.compact
    def __call__(self, x0, x1, mask0, mask1):
        dh = D_MODEL // NUM_HEADS
        to_qk = nn.Dense(D_MODEL, name="to_qk")
        to_v = nn.Dense(D_MODEL, name="to_v")
        out_proj = nn.Dense(D_MODEL, name="out_proj")
        ffn = FFN(name="ffn")

        def split(t):
            return t.reshape(t.shape[:2] + (NUM_HEADS, dh))

        qk0 = split(to_qk(x0))
        qk1 = split(to_qk(x1))
        v0 = split(to_v(x0))
        v1 = split(to_v(x1))
        from gtsfm_tpu.ops.pallas_kernels.attention import masked_attention

        B, K = x0.shape[0], x0.shape[1]
        flat = lambda t: t.transpose(0, 2, 1, 3).reshape(B * NUM_HEADS, -1, dh)
        rep = lambda m: jnp.repeat(m, NUM_HEADS, axis=0)
        m0 = masked_attention(flat(qk0), flat(qk1), flat(v1), rep(mask1))
        m1 = masked_attention(flat(qk1), flat(qk0), flat(v0), rep(mask0))
        unflat = lambda t, x: t.reshape(B, NUM_HEADS, -1, dh).transpose(0, 2, 1, 3).reshape(
            x.shape[:2] + (D_MODEL,)
        ).astype(x.dtype)
        m0 = out_proj(unflat(m0, x0))
        m1 = out_proj(unflat(m1, x1))
        return ffn(x0, m0), ffn(x1, m1)


def confidence_threshold(layer_index: int, n_layers: int = NUM_LAYERS) -> float:
    """Per-layer token-confidence threshold (official LightGlue formula)."""
    return float(np.clip(0.8 + 0.1 * np.exp(-4.0 * layer_index / n_layers), 0, 1))


class LightGlueNet(nn.Module):
    def setup(self):
        self.input_proj = nn.Dense(D_MODEL)
        self.freqs = self.param(
            "rotary_freqs", nn.initializers.normal(1.0),
            (2, (D_MODEL // NUM_HEADS) // 2),
        )
        for i in range(NUM_LAYERS):
            setattr(self, f"self{i}", SelfBlock())
            setattr(self, f"cross{i}", CrossBlock())
            if i < NUM_LAYERS - 1:
                setattr(self, f"token_conf{i}", nn.Dense(1))
                # Per-layer assignment heads (upstream log_assignment.{i}):
                # used for matching on early exit AND for the matchability
                # scores that drive point pruning.
                setattr(self, f"final_proj{i}", nn.Dense(D_MODEL))
                setattr(self, f"matchability{i}", nn.Dense(1))
        self.final_proj = nn.Dense(D_MODEL)
        self.matchability = nn.Dense(1)

    # --- staged methods (drive via apply(..., method=...)) ------------------

    def embed(self, desc0, desc1, pos0, pos1):
        x0 = self.input_proj(desc0)
        x1 = self.input_proj(desc1)
        cos0, sin0 = rotary_embed(pos0, self.freqs)
        cos1, sin1 = rotary_embed(pos1, self.freqs)
        return x0, x1, cos0, sin0, cos1, sin1

    def layer(self, i: int, x0, x1, cos0, sin0, cos1, sin1, mask0, mask1):
        sb = getattr(self, f"self{i}")
        x0 = sb(x0, cos0, sin0, mask0)
        x1 = sb(x1, cos1, sin1, mask1)
        return getattr(self, f"cross{i}")(x0, x1, mask0, mask1)

    def confident_fraction(self, i: int, x0, x1, mask0, mask1):
        """Fraction of valid tokens whose exit-confidence beats the layer
        threshold (LightGlue TokenConfidence + check_if_stop)."""
        head = getattr(self, f"token_conf{i}")
        c0 = jax.nn.sigmoid(head(x0)[..., 0])
        c1 = jax.nn.sigmoid(head(x1)[..., 0])
        th = confidence_threshold(i)
        n_conf = jnp.sum((c0 > th) * mask0) + jnp.sum((c1 > th) * mask1)
        n_tot = jnp.maximum(jnp.sum(mask0) + jnp.sum(mask1), 1.0)
        return n_conf / n_tot

    def heads(self, x0, x1):
        md0 = self.final_proj(x0)
        md1 = self.final_proj(x1)
        z0 = self.matchability(x0)[..., 0]
        z1 = self.matchability(x1)[..., 0]
        sim = jnp.einsum("bkd,bld->bkl", md0, md1) / (D_MODEL**0.25) ** 2
        return sim, z0, z1

    def heads_at(self, i: int, x0, x1):
        """Assignment head of layer i (upstream self.log_assignment[i],
        used when adaptive depth exits early)."""
        if i >= NUM_LAYERS - 1:
            return self.heads(x0, x1)
        fp = getattr(self, f"final_proj{i}")
        mt = getattr(self, f"matchability{i}")
        md0 = fp(x0)
        md1 = fp(x1)
        z0 = mt(x0)[..., 0]
        z1 = mt(x1)[..., 0]
        sim = jnp.einsum("bkd,bld->bkl", md0, md1) / (D_MODEL**0.25) ** 2
        return sim, z0, z1

    def prune_scores(self, i: int, x0, x1):
        """Token exit-confidence + matchability of layer i (the two signals
        of upstream get_pruning_mask). Returns (conf0, conf1, m0, m1)."""
        head = getattr(self, f"token_conf{i}")
        conf0 = jax.nn.sigmoid(head(x0)[..., 0])
        conf1 = jax.nn.sigmoid(head(x1)[..., 0])
        mt = getattr(self, f"matchability{i}")
        m0 = jax.nn.sigmoid(mt(x0)[..., 0])
        m1 = jax.nn.sigmoid(mt(x1)[..., 0])
        return conf0, conf1, m0, m1

    def __call__(self, desc0, desc1, pos0, pos1, mask0, mask1):
        """Full static depth (the jit-once fast path for batched matching)."""
        x0, x1, cos0, sin0, cos1, sin1 = self.embed(desc0, desc1, pos0, pos1)
        for i in range(NUM_LAYERS):
            x0, x1 = self.layer(i, x0, x1, cos0, sin0, cos1, sin1, mask0, mask1)
        return self.heads(x0, x1)

    def init_all(self, desc0, desc1, pos0, pos1, mask0, mask1):
        """Init-time path touching every submodule (incl. confidence heads)."""
        x0, x1, cos0, sin0, cos1, sin1 = self.embed(desc0, desc1, pos0, pos1)
        fracs = []
        for i in range(NUM_LAYERS):
            x0, x1 = self.layer(i, x0, x1, cos0, sin0, cos1, sin1, mask0, mask1)
            if i < NUM_LAYERS - 1:
                fracs.append(self.confident_fraction(i, x0, x1, mask0, mask1))
                fracs.append(self.prune_scores(i, x0, x1)[0])
                fracs.append(self.heads_at(i, x0, x1)[1])
        return self.heads(x0, x1)


def assignment_scores(sim, z0, z1, mask0, mask1):
    """Double-softmax + matchability -> log assignment (B, K0, K1)
    (LightGlue MatchAssignment)."""
    sim = jnp.where(mask0[:, :, None] > 0, sim, NEG)
    sim = jnp.where(mask1[:, None, :] > 0, sim, NEG)
    ls0 = jax.nn.log_softmax(sim, axis=2)
    ls1 = jax.nn.log_softmax(sim, axis=1)
    cert0 = jax.nn.log_sigmoid(z0)
    cert1 = jax.nn.log_sigmoid(z1)
    return ls0 + ls1 + cert0[:, :, None] + cert1[:, None, :]


def _extract_matches(sim, z0, z1, mask0, mask1, match_threshold):
    logP = assignment_scores(sim, z0, z1, mask0, mask1)
    best12 = jnp.argmax(logP, axis=2)
    best21 = jnp.argmax(logP, axis=1)
    k_ids = jnp.arange(logP.shape[1])[None, :]
    mutual = jnp.take_along_axis(best21, best12, axis=1) == k_ids
    score = jnp.exp(jnp.take_along_axis(logP, best12[..., None], axis=2)[..., 0])
    ok = mutual & (score > match_threshold) & (mask0 > 0)
    ok = ok & (jnp.take_along_axis(mask1, best12, axis=1) > 0)
    return jnp.where(ok, best12, -1).astype(jnp.int32), ok.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("net",))
def _run_full(net, params, desc0, desc1, pos0, pos1, mask0, mask1, match_threshold):
    sim, z0, z1 = net.apply({"params": params}, desc0, desc1, pos0, pos1, mask0, mask1)
    return _extract_matches(sim, z0, z1, mask0, mask1, match_threshold)


@functools.partial(jax.jit, static_argnames=("net", "method", "i"))
def _apply_jit(net, params, *args, method, i=None):
    if i is None:
        return net.apply({"params": params}, *args, method=method)
    return net.apply({"params": params}, i, *args, method=method)


@functools.partial(jax.jit, static_argnames=("net", "i"))
def _heads_and_extract(net, params, x0, x1, mask0, mask1, match_threshold,
                       i=NUM_LAYERS - 1):
    sim, z0, z1 = net.apply({"params": params}, i, x0, x1, method="heads_at")
    return _extract_matches(sim, z0, z1, mask0, mask1, match_threshold)


class LightGlue:
    def __init__(self, params=None, match_threshold: float = 0.1,
                 depth_confidence: float | None = None,
                 width_confidence: float | None = None,
                 width_min_keypoints: int = 512,
                 checkpoint_path: str | None = None):
        """depth_confidence: enable adaptive depth when set (upstream default
        0.95); width_confidence: enable adaptive width / point pruning when
        set (upstream default 0.99) — tokens that are confident and have
        matchability <= 1 - width_confidence are dropped from later layers
        (bucket-compacted to multiples of 128, never below
        width_min_keypoints). None/None runs all NUM_LAYERS in one jitted
        program."""
        self.net = LightGlueNet()
        self.match_threshold = match_threshold
        self.depth_confidence = depth_confidence
        self.width_confidence = width_confidence
        self.width_min_keypoints = width_min_keypoints
        if params is None and checkpoint_path:
            params = convert_torch_checkpoint(checkpoint_path)
        self.params = params
        self.last_depth: int | None = None  # layers executed on the last call
        self.last_widths: tuple[int, int] | None = None  # final token counts

    def init_random(self, k: int = 32, seed: int = 0):
        z = jnp.zeros((1, k, D_MODEL))
        p = jnp.zeros((1, k, 2))
        m = jnp.ones((1, k))
        self.params = self.net.init(
            jax.random.PRNGKey(seed), z, z, p, p, m, m, method="init_all"
        )["params"]
        return self

    def _run(self, desc0, desc1, pos0, pos1, mask0, mask1):
        self.last_depth = NUM_LAYERS
        return _run_full(
            self.net, self.params, desc0, desc1, pos0, pos1, mask0, mask1,
            self.match_threshold,
        )

    @staticmethod
    def _compact(keep: np.ndarray, new_k: int, *arrays):
        """Gather the kept tokens to the front of the token axis (length
        new_k). keep: (B, K) bool. Returns (orig_idx (B, new_k), new_mask,
        gathered arrays). Padded slots point at token 0 with mask 0."""
        B, K = keep.shape
        idx = np.zeros((B, new_k), np.int32)
        new_mask = np.zeros((B, new_k), np.float32)
        for b in range(B):
            kept = np.nonzero(keep[b])[0]
            n = min(len(kept), new_k)
            idx[b, :n] = kept[:n]
            new_mask[b, :n] = 1.0
        gathered = [jnp.asarray(a)[jnp.arange(B)[:, None], idx] for a in arrays]
        return idx, jnp.asarray(new_mask), gathered

    def _run_adaptive(self, desc0, desc1, pos0, pos1, mask0, mask1):
        """Early-exit + point-pruning inference: one jitted program per
        layer, scalar host sync between layers (the original's adaptive
        depth/width mechanisms; upstream LightGlue.forward)."""
        x0, x1, cos0, sin0, cos1, sin1 = _apply_jit(
            self.net, self.params, desc0, desc1, pos0, pos1, method="embed"
        )
        B, K0 = mask0.shape
        K1 = mask1.shape[1]
        # orig*[b, k] = original keypoint slot of current token k.
        orig0 = np.tile(np.arange(K0, dtype=np.int32), (B, 1))
        orig1 = np.tile(np.arange(K1, dtype=np.int32), (B, 1))
        depth = NUM_LAYERS
        exit_layer = NUM_LAYERS - 1
        for i in range(NUM_LAYERS):
            x0, x1 = _apply_jit(
                self.net, self.params, x0, x1, cos0, sin0, cos1, sin1,
                mask0, mask1, method="layer", i=i,
            )
            if i >= NUM_LAYERS - 1:
                break
            conf0, conf1, m0, m1 = _apply_jit(
                self.net, self.params, x0, x1, method="prune_scores", i=i
            )
            if self.depth_confidence is not None:
                th = confidence_threshold(i)
                n_conf = float(jnp.sum((conf0 > th) * mask0) + jnp.sum((conf1 > th) * mask1))
                n_tot = max(float(jnp.sum(mask0) + jnp.sum(mask1)), 1.0)
                if n_conf / n_tot > self.depth_confidence:
                    depth = i + 1
                    exit_layer = i
                    break
            if self.width_confidence is not None:
                # Upstream get_pruning_mask: keep matchable-enough tokens and
                # tokens whose embedding hasn't converged yet.
                th = confidence_threshold(i)

                def prune_side(m, conf, mask, x, cos, sin, orig, k_min):
                    keep_j = ((m > (1.0 - self.width_confidence))
                              | (conf <= th)) & (mask > 0)
                    keep = np.asarray(keep_j)
                    max_keep = int(keep.sum(axis=1).max())
                    new_k = max(((max_keep + 127) // 128) * 128, k_min)
                    if new_k >= mask.shape[1]:
                        return mask, x, cos, sin, orig
                    idx, new_mask, (x_g, cos_g, sin_g) = self._compact(
                        keep, new_k, x, cos, sin
                    )
                    orig_g = np.take_along_axis(orig, idx, axis=1)
                    return new_mask, x_g, cos_g, sin_g, orig_g

                if mask0.shape[1] > self.width_min_keypoints:
                    mask0, x0, cos0, sin0, orig0 = prune_side(
                        m0, conf0, mask0, x0, cos0, sin0, orig0,
                        self.width_min_keypoints,
                    )
                if mask1.shape[1] > self.width_min_keypoints:
                    mask1, x1, cos1, sin1, orig1 = prune_side(
                        m1, conf1, mask1, x1, cos1, sin1, orig1,
                        self.width_min_keypoints,
                    )
        self.last_depth = depth
        self.last_widths = (mask0.shape[1], mask1.shape[1])
        idx_c, mm_c = _heads_and_extract(
            self.net, self.params, x0, x1, mask0, mask1, self.match_threshold,
            i=exit_layer,
        )
        if mask0.shape[1] == K0 and mask1.shape[1] == K1:
            return idx_c, mm_c
        # Scatter compacted matches back to the original keypoint slots.
        idx_c = np.asarray(idx_c)
        mm_c = np.asarray(mm_c)
        out_idx = np.full((B, K0), -1, np.int32)
        out_mm = np.zeros((B, K0), np.float32)
        for b in range(B):
            ok = mm_c[b] > 0
            out_idx[b, orig0[b, ok]] = orig1[b, idx_c[b, ok]]
            out_mm[b, orig0[b, ok]] = 1.0
        return jnp.asarray(out_idx), jnp.asarray(out_mm)

    def __call__(self, desc0, desc1, kpts0, kpts1, mask0, mask1,
                 image_shape0, image_shape1):
        def norm_kpts(kpts, shape):
            h, w = shape
            size = jnp.asarray([w, h], jnp.float32)
            return (kpts - size / 2.0) / jnp.max(size)

        args = (
            desc0, desc1, norm_kpts(kpts0, image_shape0),
            norm_kpts(kpts1, image_shape1), mask0, mask1,
        )
        if self.depth_confidence is not None or self.width_confidence is not None:
            return self._run_adaptive(*args)
        return self._run(*args)


def convert_torch_checkpoint(path: str):
    """Official superpoint_lightglue.pth -> flax params (best-effort mapping
    of the public layout; raises with the missing keys listed if the layout
    differs)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]

    def dense(prefix):
        w = sd[f"{prefix}.weight"].numpy()
        if w.ndim == 3:
            w = w[..., 0]
        b_key = f"{prefix}.bias"
        out = {"kernel": np.transpose(w, (1, 0))}
        if b_key in sd:
            out["bias"] = sd[b_key].numpy()
        else:
            out["bias"] = np.zeros(w.shape[0], np.float32)
        return out

    params: dict = {}
    params["input_proj"] = dense("input_proj")
    # Rotary frequencies: posenc.Wr (Linear(2, dh/2, bias=False)).
    params["rotary_freqs"] = np.transpose(sd["posenc.Wr.weight"].numpy(), (1, 0))
    for i in range(NUM_LAYERS):
        base = f"transformers.{i}"
        params[f"self{i}"] = {
            "Wqkv": dense(f"{base}.self_attn.Wqkv"),
            "out_proj": dense(f"{base}.self_attn.out_proj"),
            "ffn": {
                "fc1": dense(f"{base}.self_attn.ffn.0"),
                "ln": {
                    "scale": sd[f"{base}.self_attn.ffn.1.weight"].numpy(),
                    "bias": sd[f"{base}.self_attn.ffn.1.bias"].numpy(),
                },
                "fc2": dense(f"{base}.self_attn.ffn.3"),
            },
        }
        params[f"cross{i}"] = {
            "to_qk": dense(f"{base}.cross_attn.to_qk"),
            "to_v": dense(f"{base}.cross_attn.to_v"),
            "out_proj": dense(f"{base}.cross_attn.to_out" if f"{base}.cross_attn.to_out.weight" in sd else f"{base}.cross_attn.out_proj"),
            "ffn": {
                "fc1": dense(f"{base}.cross_attn.ffn.0"),
                "ln": {
                    "scale": sd[f"{base}.cross_attn.ffn.1.weight"].numpy(),
                    "bias": sd[f"{base}.cross_attn.ffn.1.bias"].numpy(),
                },
                "fc2": dense(f"{base}.cross_attn.ffn.3"),
            },
        }
    last = NUM_LAYERS - 1
    params["final_proj"] = dense(f"log_assignment.{last}.final_proj")
    params["matchability"] = dense(f"log_assignment.{last}.matchability")
    # Per-layer assignment heads (early-exit matching + pruning matchability).
    # Fall back to the last layer's head if a checkpoint omits them.
    for i in range(NUM_LAYERS - 1):
        if f"log_assignment.{i}.final_proj.weight" in sd:
            params[f"final_proj{i}"] = dense(f"log_assignment.{i}.final_proj")
            params[f"matchability{i}"] = dense(f"log_assignment.{i}.matchability")
        else:
            params[f"final_proj{i}"] = dict(params["final_proj"])
            params[f"matchability{i}"] = dict(params["matchability"])
    # Adaptive-depth exit heads (token_confidence.{i}.token.0 = Linear(d, 1)).
    for i in range(NUM_LAYERS - 1):
        key = f"token_confidence.{i}.token.0"
        if f"{key}.weight" in sd:
            params[f"token_conf{i}"] = dense(key)
        else:
            params[f"token_conf{i}"] = {
                "kernel": np.zeros((D_MODEL, 1), np.float32),
                "bias": np.zeros(1, np.float32),
            }
    return jax.tree_util.tree_map(jnp.asarray, params)
