"""PatchmatchNet (learned multi-scale patchmatch MVS) in Flax.

TPU-native port of the reference's densify engine
(thirdparty/patchmatchnet/models/{net,patchmatch,module}.py, wrapped by
gtsfm/densify/mvs_patchmatchnet.py:55). Architecture follows the original:

  FeatureNet        FPN over 4 scales, channels (8, 16, 32, 64), 1x1 output
                    heads -> stage features with 64/32/16 channels (net.py:15).
  PatchMatch x3     coarse-to-fine (stage 3 -> 1), iterations (1, 2, 2),
                    inverse-depth sample counts (48 init; 16/8/8 local):
                      - random initialization at the coarsest stage
                      - local perturbation sampling (interval_scale
                        0.025/0.0125/0.005)
                      - propagation: ADAPTIVE — a learned conv on reference
                        features predicts per-pixel deformable offsets added
                        to the dilated neighbor grid; depth hypotheses are
                        bilinearly gathered at those positions (propa_conv +
                        grid_sample in the original, zero-init = fixed grid)
                      - evaluation: differentiable homography warping of src
                        features per depth sample, group-wise correlation
                        (G = 4/8/8), pixel-wise view weights (PixelwiseNet),
                        SimilarityNet conv stack -> score volume -> softmax
                        depth regression
  Refinement        image-guided residual upsampling to full resolution
                    (net.py:78).

NOTE deviations from the original (kept minimal, each flagged):
  * adaptive EVALUATION offsets (deformable spatial cost aggregation) are
    replaced by the fixed grid they are initialized to; adaptive PROPAGATION
    is ported exactly (learned offset conv + deformable bilinear gather).
  * batch norm is folded (eval mode) into convs at conversion time; the Flax
    graph is conv -> relu.

All shapes static; vmapped over source views; NHWC layout.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBnReLU(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.ch, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding="SAME", use_bias=True, name="conv",
        )(x)
        return nn.relu(x)


class FeatureNet(nn.Module):
    """FPN feature extractor (net.py:15): stage_3 (H/8, 64ch),
    stage_2 (H/4, 32ch), stage_1 (H/2, 16ch)."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        c1 = ConvBnReLU(8, name="conv1")(ConvBnReLU(8, name="conv0")(x))
        c4 = ConvBnReLU(16, name="conv4")(
            ConvBnReLU(16, name="conv3")(ConvBnReLU(16, 5, 2, name="conv2")(c1))
        )
        c7 = ConvBnReLU(32, name="conv7")(
            ConvBnReLU(32, name="conv6")(ConvBnReLU(32, 5, 2, name="conv5")(c4))
        )
        c10 = ConvBnReLU(64, name="conv10")(
            ConvBnReLU(64, name="conv9")(ConvBnReLU(64, 5, 2, name="conv8")(c7))
        )
        out3 = nn.Conv(64, (1, 1), use_bias=False, name="output1")(c10)

        def up2(t):
            B, H, W, C = t.shape
            return jax.image.resize(t, (B, 2 * H, 2 * W, C), "bilinear")

        intra = up2(c10) + nn.Conv(64, (1, 1), name="inner1")(c7)
        out2 = nn.Conv(32, (1, 1), use_bias=False, name="output2")(intra)
        intra = up2(intra) + nn.Conv(64, (1, 1), name="inner2")(c4)
        out1 = nn.Conv(16, (1, 1), use_bias=False, name="output3")(intra)
        return {"stage_3": out3, "stage_2": out2, "stage_1": out1}


def bilinear_sample_nhwc(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); u, v (...,) pixel coords -> (..., C), zeros out of range."""
    H, W, C = img.shape
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - x0)[..., None]
    fv = (v - y0)[..., None]
    val = (
        img[y0, x0] * (1 - fv) * (1 - fu)
        + img[y0, x0 + 1] * (1 - fv) * fu
        + img[y0 + 1, x0] * fv * (1 - fu)
        + img[y0 + 1, x0 + 1] * fv * fu
    )
    return val * inb[..., None]


def warp_src_feature(
    src_feat: jnp.ndarray,  # (H, W, C)
    K_ref: jnp.ndarray, K_src: jnp.ndarray,  # (3, 3) stage-scaled intrinsics
    sRr: jnp.ndarray, str_: jnp.ndarray,  # src_T_ref
    depths: jnp.ndarray,  # (D, H, W) depth hypotheses per ref pixel
) -> jnp.ndarray:
    """Differentiable homography warping (patchmatch.py differentiable_warping):
    returns (D, H, W, C) src features sampled at each ref-pixel hypothesis."""
    H, W = depths.shape[1:]
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)  # (H, W, 3)
    rays = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K_ref), pix)

    def one_depth(d):
        X = rays * d[..., None]  # ref cam frame
        Xs = jnp.einsum("ij,hwj->hwi", sRr, X) + str_
        z = jnp.maximum(Xs[..., 2], 1e-6)
        uv = jnp.einsum("ij,hwj->hwi", K_src, Xs / z[..., None])
        return bilinear_sample_nhwc(src_feat, uv[..., 0], uv[..., 1])

    return jax.vmap(one_depth)(depths)


class PixelwiseNet(nn.Module):
    """View-weight net (patchmatch.py:945): conv over the group-correlation
    volume -> sigmoid -> max over depth samples -> per-pixel view weight."""

    @nn.compact
    def __call__(self, corr):  # (D, H, W, G)
        x = ConvBnReLU(16, 1, name="conv0")(corr)
        x = ConvBnReLU(8, 1, name="conv1")(x)
        x = nn.Conv(1, (1, 1), name="conv2")(x)
        x = jax.nn.sigmoid(x)  # (D, H, W, 1)
        return jnp.max(x, axis=0)  # (H, W, 1)


class SimilarityNet(nn.Module):
    """Score head over the aggregated correlation volume (patchmatch.py:793;
    the adaptive spatial gather is replaced by SAME 3x3 convs — see module
    docstring NOTE)."""

    @nn.compact
    def __call__(self, corr):  # (D, H, W, G)
        x = ConvBnReLU(16, 1, name="conv0")(corr)
        x = ConvBnReLU(8, 3, name="conv1")(x)
        x = nn.Conv(1, (3, 3), name="similarity")(x)
        return x[..., 0]  # (D, H, W)


_OFFSETS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
_OFFSETS16 = _OFFSETS8 + [
    (-2, 0), (2, 0), (0, -2), (0, 2), (-2, -2), (-2, 2), (2, -2), (2, 2)
]


def propagation_hypotheses(depth: jnp.ndarray, dilation: int, num_neighbors: int):
    """Neighbor depth hypotheses from the fixed dilated grid
    (patchmatch.py Propagation with zero learned offsets).

    depth: (H, W) -> (num_neighbors, H, W)."""
    offs = (_OFFSETS8 if num_neighbors <= 8 else _OFFSETS16)[:num_neighbors]
    outs = []
    for dy, dx in offs:
        outs.append(
            jnp.roll(depth, (dy * dilation, dx * dilation), axis=(0, 1))
        )
    return jnp.stack(outs)


def deformable_gather(depth: jnp.ndarray, offsets: jnp.ndarray,
                      dilation: int, num_neighbors: int) -> jnp.ndarray:
    """Adaptive propagation gather (patchmatch.py propa_conv + grid_sample):
    per-pixel learned 2D offsets are ADDED to the fixed dilated grid and the
    depth map is sampled bilinearly at those deformable positions.

    depth: (H, W); offsets: (H, W, 2*num_neighbors) as (dy, dx) pairs.
    Returns (num_neighbors, H, W).
    """
    H, W = depth.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=depth.dtype), jnp.arange(W, dtype=depth.dtype),
        indexing="ij",
    )
    base = (_OFFSETS8 if num_neighbors <= 8 else _OFFSETS16)[:num_neighbors]
    outs = []
    for k, (dy, dx) in enumerate(base):
        # Sampling direction matches propagation_hypotheses' roll convention
        # (out[y, x] = depth[y - dy*dil, x - dx*dil] at zero offsets).
        sy = yy - (dy * dilation + offsets[..., 2 * k])
        sx = xx - (dx * dilation + offsets[..., 2 * k + 1])
        sy = jnp.clip(sy, 0.0, H - 1.001)
        sx = jnp.clip(sx, 0.0, W - 1.001)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        fy = sy - y0
        fx = sx - x0
        d = (
            depth[y0, x0] * (1 - fy) * (1 - fx)
            + depth[y0, x0 + 1] * (1 - fy) * fx
            + depth[y0 + 1, x0] * fy * (1 - fx)
            + depth[y0 + 1, x0 + 1] * fy * fx
        )
        outs.append(d)
    return jnp.stack(outs)


class PatchMatchStage(nn.Module):
    """One coarse-to-fine stage: sampling + evaluation iterations."""

    G: int
    num_sample_init: int
    num_sample_local: int
    interval_scale: float
    iterations: int
    propagate_neighbors: int
    propagation_dilation: int
    random_init: bool

    @nn.compact
    def __call__(self, ref_feat, src_feats, K_ref, K_srcs, sRr, str_,
                 inv_d_min, inv_d_max, depth_init, rng_seed=0):
        """ref_feat (H, W, C); src_feats (S, H, W, C); depth_init (H, W) or
        None at the coarsest stage. Returns (depth (H, W), score (H, W))."""
        H, W, C = ref_feat.shape
        S = src_feats.shape[0]
        pixelwise = PixelwiseNet(name="pixelwise")
        propa_conv = None
        if self.propagate_neighbors > 0:
            propa_conv = nn.Conv(
                2 * self.propagate_neighbors, (3, 3),
                kernel_dilation=self.propagation_dilation,
                kernel_init=nn.initializers.zeros,
                name="propa_conv",
            )
        similarity = SimilarityNet(name="similarity")

        view_w = None
        depth = depth_init

        for it in range(self.iterations):
            # --- depth sample generation
            if depth is None:
                D = self.num_sample_init
                # Stratified random inverse-depth (DepthInitialization :31).
                key = jax.random.PRNGKey(rng_seed)
                u = jax.random.uniform(key, (D, H, W))
                lev = (jnp.arange(D, dtype=jnp.float32) / D)[:, None, None]
                inv_d = inv_d_min + (lev + u / D) * (inv_d_max - inv_d_min)
                samples = 1.0 / jnp.maximum(inv_d, 1e-9)
            else:
                # Local perturbation around current depth + propagation.
                Dl = self.num_sample_local
                lev = jnp.linspace(-1.0, 1.0, Dl)[:, None, None]
                inv_cur = 1.0 / jnp.maximum(depth, 1e-9)
                inv_pert = inv_cur[None] + lev * self.interval_scale * (inv_d_max - inv_d_min)
                inv_pert = jnp.clip(inv_pert, inv_d_min, inv_d_max)
                samples = 1.0 / jnp.maximum(inv_pert, 1e-9)
                if self.propagate_neighbors > 0:
                    # Adaptive propagation: a conv on the reference features
                    # predicts per-pixel deformable offsets (zero-init ->
                    # exactly the fixed dilated grid at initialization; ONE
                    # conv shared across iterations, matching the original's
                    # single propa_conv per stage).
                    off = propa_conv(ref_feat)
                    prop = deformable_gather(
                        depth, off, self.propagation_dilation,
                        self.propagate_neighbors,
                    )
                    samples = jnp.concatenate([samples, prop], axis=0)

            D = samples.shape[0]

            # --- evaluation: group correlation against each src view
            def corr_one_src(sf, Ks, R, t):
                warped = warp_src_feature(sf, K_ref, Ks, R, t, samples)  # (D, H, W, C)
                ref_g = ref_feat.reshape(H, W, self.G, C // self.G)
                war_g = warped.reshape(D, H, W, self.G, C // self.G)
                return jnp.mean(war_g * ref_g[None], axis=-1)  # (D, H, W, G)

            corrs = jax.vmap(corr_one_src)(src_feats, K_srcs, sRr, str_)  # (S, D, H, W, G)

            if view_w is None:
                view_w = jax.vmap(pixelwise)(corrs)  # (S, H, W, 1)
            wsum = jnp.sum(view_w, axis=0) + 1e-6  # (H, W, 1)
            agg = jnp.sum(corrs * view_w[:, None], axis=0) / wsum[None]  # (D, H, W, G)

            score = similarity(agg)  # (D, H, W)
            prob = jax.nn.softmax(score, axis=0)
            depth = jnp.sum(prob * samples, axis=0)  # regression (H, W)

        conf = jnp.max(jax.nn.softmax(score, axis=0), axis=0)
        return depth, conf


class Refinement(nn.Module):
    """Image-guided depth refinement at full resolution (net.py:78)."""

    @nn.compact
    def __call__(self, image, depth, d_min, d_max):  # image (H, W, 3), depth (H/2, W/2)
        H, W = image.shape[:2]
        dn = (depth - d_min) / jnp.maximum(d_max - d_min, 1e-9)
        dn_up = jax.image.resize(dn[..., None], (H, W, 1), "bilinear")
        img_f = ConvBnReLU(8, name="conv0")(image[None])[0]
        d_f = ConvBnReLU(8, name="conv1")(dn_up[None])[0]
        x = jnp.concatenate([img_f, d_f], axis=-1)
        x = ConvBnReLU(8, name="conv2")(x[None])[0]
        res = nn.Conv(1, (3, 3), name="res")(x[None])[0, ..., 0]
        dn_ref = jnp.clip(dn_up[..., 0] + res, 0.0, 1.0)
        return dn_ref * (d_max - d_min) + d_min


class PatchmatchNet(nn.Module):
    """Full coarse-to-fine model. Call with one reference view + S sources."""

    @nn.compact
    def __call__(self, ref_img, src_imgs, K_ref, K_srcs, sRr, str_, d_min, d_max):
        """ref_img (H, W, 3) in [0,1] (H, W divisible by 8); src_imgs
        (S, H, W, 3). K at full resolution. Returns (depth (H, W), conf)."""
        feat = FeatureNet(name="feature")
        ref_feats = feat(ref_img[None])
        src_feats = feat(src_imgs)

        inv_min = 1.0 / d_max
        inv_max = 1.0 / d_min

        def scale_K(K, s):
            return jnp.asarray(
                [[K[0, 0] * s, 0.0, K[0, 2] * s],
                 [0.0, K[1, 1] * s, K[1, 2] * s],
                 [0.0, 0.0, 1.0]]
            )

        stage_cfg = {
            3: dict(G=8, num_sample_init=48, num_sample_local=16,
                    interval_scale=0.025, iterations=1, propagate_neighbors=0,
                    propagation_dilation=2, random_init=True),
            2: dict(G=8, num_sample_init=0, num_sample_local=8,
                    interval_scale=0.0125, iterations=2, propagate_neighbors=8,
                    propagation_dilation=4, random_init=False),
            1: dict(G=4, num_sample_init=0, num_sample_local=8,
                    interval_scale=0.005, iterations=2, propagate_neighbors=16,
                    propagation_dilation=6, random_init=False),
        }

        depth = None
        conf = None
        for stage in (3, 2, 1):
            s = 0.5**stage
            cfg = stage_cfg[stage]
            rf = ref_feats[f"stage_{stage}"][0]
            sf = src_feats[f"stage_{stage}"]
            Kr = scale_K(K_ref, s)
            Ks = jax.vmap(lambda K: scale_K(K, s))(K_srcs)
            if depth is not None:
                H_s, W_s = rf.shape[:2]
                depth = jax.image.resize(depth[..., None], (H_s, W_s, 1), "bilinear")[..., 0]
            pm = PatchMatchStage(**cfg, name=f"patchmatch_{stage}")
            depth, conf = pm(rf, sf, Kr, Ks, sRr, str_, inv_min, inv_max, depth)

        depth = Refinement(name="refinement")(ref_img, depth, d_min, d_max)
        H, W = ref_img.shape[:2]
        conf_full = jax.image.resize(conf[..., None], (H, W, 1), "bilinear")[..., 0]
        return depth, conf_full


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (official patchmatchnet.ckpt layout)
# ---------------------------------------------------------------------------


def convert_torch_checkpoint(path: str):
    """Official PatchmatchNet checkpoint -> flax params.

    Handles lightning checkpoints ({'state_dict' or 'model': ...}) and the
    'module.' DataParallel prefix. Eval-mode BatchNorms fold into the convs;
    the reference's 1x1x1 Conv3d score/weight heads map onto our 2D heads
    (1x1 exactly; where our head uses a 3x3 conv the 1x1 kernel embeds as the
    center tap, which reproduces the upstream operator exactly).

    NOT mapped (architecture deviation, see module NOTE): eval_conv (adaptive
    evaluation offsets) and the Refinement deconv/bn/conv2 (our refinement
    concatenates + convs at full res; torch conv3 (16->8) maps to our conv2).
    """
    import torch

    payload = torch.load(path, map_location="cpu")
    sd = payload.get("state_dict", payload.get("model", payload))
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def conv(prefix, bn_prefix=None, pad_to=None):
        w = sd[f"{prefix}.weight"].numpy()
        if w.ndim == 5:  # Conv3d 1x1x1 -> 2D
            w = w[..., 0]
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
        k = np.transpose(w, (2, 3, 1, 0))  # (kh, kw, I, O)
        if pad_to is not None and k.shape[0] < pad_to:
            # Embed a 1x1 torch kernel as the center tap of our KxK conv.
            full = np.zeros((pad_to, pad_to) + k.shape[2:], k.dtype)
            full[pad_to // 2, pad_to // 2] = k[0, 0]
            k = full
        return {"kernel": k, "bias": b}

    def cbr(prefix, pad_to=None):
        return {"conv": conv(f"{prefix}.conv", f"{prefix}.bn", pad_to=pad_to)}

    feature = {f"conv{i}": cbr(f"feature.conv{i}") for i in range(11)}
    feature["output1"] = conv("feature.output1")
    feature["output2"] = conv("feature.output2")
    feature["output3"] = conv("feature.output3")
    feature["inner1"] = conv("feature.inner1")
    feature["inner2"] = conv("feature.inner2")

    def stage(i):
        base = f"patchmatch_{i}"
        p = {
            "pixelwise": {
                "conv0": cbr(f"{base}.evaluation.pixel_wise_net.conv0"),
                "conv1": cbr(f"{base}.evaluation.pixel_wise_net.conv1"),
                "conv2": conv(f"{base}.evaluation.pixel_wise_net.conv2"),
            },
            "similarity": {
                "conv0": cbr(f"{base}.evaluation.similarity_net.conv0"),
                "conv1": cbr(f"{base}.evaluation.similarity_net.conv1", pad_to=3),
                "similarity": conv(f"{base}.evaluation.similarity_net.similarity", pad_to=3),
            },
        }
        if f"{base}.propa_conv.weight" in sd:
            p["propa_conv"] = conv(f"{base}.propa_conv")
        return p

    params = {
        "feature": feature,
        "patchmatch_1": stage(1),
        "patchmatch_2": stage(2),
        "patchmatch_3": stage(3),
        "refinement": {
            "conv0": cbr("upsample_net.conv0"),
            "conv1": cbr("upsample_net.conv1"),
            "conv2": cbr("upsample_net.conv3"),  # torch conv3: (16 -> 8)
            "res": conv("upsample_net.res"),
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)
