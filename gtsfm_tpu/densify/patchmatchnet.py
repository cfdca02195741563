"""PatchmatchNet (learned multi-scale patchmatch MVS) in Flax.

TPU-native port of the reference's densify engine
(thirdparty/patchmatchnet/models/{net,patchmatch,module}.py, wrapped by
gtsfm/densify/mvs_patchmatchnet.py:55). Architecture follows the original
exactly (official-checkpoint compatible):

  FeatureNet        FPN over 4 scales, channels (8, 16, 32, 64), 1x1 output
                    heads -> stage features with 64/32/16 channels (net.py:15).
  PatchMatch x3     coarse-to-fine (stage 3 -> 1); per-stage config matching
                    net.py:142-147 (lists indexed stage 1..3):
                      interval_scale (0.005, 0.0125, 0.025)
                      dilation       (6, 4, 2)
                      iterations     (1, 2, 2)
                      num_sample     (8, 8, 16)  [48 random-init at stage 3]
                      propagate      (0, 8, 16)
                      evaluate       (9, 9, 9)   [eval dilation = dilation-1]
                      G              (4, 8, 8)
                    Each iteration: inverse-depth perturbation samples around
                    the current depth (arange(-D/2, D/2) * interval) +
                    ADAPTIVE PROPAGATION (propa_conv offsets + deformable
                    gather, patchmatch.py:393-408); group-wise correlation of
                    warped src features with pixel-wise view weights
                    (PixelwiseNet, computed ONCE at stage-3 iteration 1 and
                    reused/upsampled through all later stages, net.py:256-298);
                    ADAPTIVE EVALUATION (spatial cost aggregation,
                    patchmatch.py:410-423): eval_conv offsets define 9
                    deformable neighbors; per-neighbor weights =
                    FeatureWeightNet feature similarity x depth-difference
                    weight (patchmatch.py:894-942); the 1x1-conv score volume
                    is gathered at the neighbors and weight-summed
                    (SimilarityNet, patchmatch.py:793-838); softmax ->
                    expectation regression (inverse-depth INDEX regression at
                    the final stage-1 iteration, patchmatch.py:324-334).
  Refinement        image-guided residual upsampling to full resolution
                    (net.py:78-134: conv0 on image; conv1->conv2->deconv(+bn)
                    on normalized depth; concat; conv3 -> res).
  Confidence        4-bin depth-window sum of the final score volume gathered
                    at the regressed depth index (net.py:313-324).

Faithful quirk: the propagation/evaluation grids are built in
align_corners=True normalization but sampled by upstream F.grid_sample with
align_corners=False (patchmatch.py:155,833,879,929) — the effective sample
position is p*S/(S-1) - 0.5 with border padding; `_sample_border` reproduces
this exactly. Warping (module.py:184-190) uses align_corners=True + zeros
padding, reproduced by `bilinear_sample_nhwc`.

Batch norm is folded (eval mode) into convs at conversion time.
All shapes static; vmapped over source views; NHWC layout.
"""

from __future__ import annotations

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
    """img (H, W, C); u, v (...,) pixel coords -> (..., C), zeros out of range
    (upstream warping: grid_sample align_corners=True, padding zeros)."""
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


def _sample_border(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W, C) at pixel positions (sx, sy) replicating
    the upstream propagation/evaluation grid_sample call exactly: grids built
    with align_corners=True normalization but sampled align_corners=False
    with border padding -> effective position p*S/(S-1) - 0.5, clamped."""
    H, W, C = img.shape
    u = jnp.clip(sx * (W / (W - 1.0)) - 0.5, 0.0, W - 1.0)
    v = jnp.clip(sy * (H / (H - 1.0)) - 0.5, 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(u).astype(jnp.int32), W - 2)
    y0 = jnp.minimum(jnp.floor(v).astype(jnp.int32), H - 2)
    fu = (u - x0)[..., None]
    fv = (v - y0)[..., None]
    return (
        img[y0, x0] * (1 - fv) * (1 - fu)
        + img[y0, x0 + 1] * (1 - fv) * fu
        + img[y0 + 1, x0] * fv * (1 - fu)
        + img[y0 + 1, x0 + 1] * fv * fu
    )


def warp_src_feature(
    src_feat: jnp.ndarray,  # (H, W, C)
    K_ref: jnp.ndarray, K_src: jnp.ndarray,  # (3, 3) stage-scaled intrinsics
    sRr: jnp.ndarray, str_: jnp.ndarray,  # src_T_ref
    depths: jnp.ndarray,  # (D, H, W) depth hypotheses per ref pixel
) -> jnp.ndarray:
    """Differentiable homography warping (module.py:134 differentiable_warping):
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
    """View-weight net (patchmatch.py:945): 1x1 convs over the group
    correlation volume -> sigmoid -> max over depth samples."""

    @nn.compact
    def __call__(self, corr):  # (D, H, W, G)
        x = ConvBnReLU(16, 1, name="conv0")(corr)
        x = ConvBnReLU(8, 1, name="conv1")(x)
        x = nn.Conv(1, (1, 1), name="conv2")(x)
        x = jax.nn.sigmoid(x)  # (D, H, W, 1)
        return jnp.max(x, axis=0)  # (H, W, 1)


class SimilarityNet(nn.Module):
    """Score head + adaptive spatial cost aggregation (patchmatch.py:793):
    1x1 convs on the view-aggregated correlation -> per-sample score map,
    gathered at the deformable evaluation neighbors and weight-summed."""

    @nn.compact
    def __call__(self, corr, pos, weight):
        # corr (D, H, W, G); pos (K, H, W, 2) as (x, y); weight (D, K, H, W)
        x = ConvBnReLU(16, 1, name="conv0")(corr)
        x = ConvBnReLU(8, 1, name="conv1")(x)
        s = nn.Conv(1, (1, 1), name="similarity")(x)[..., 0]  # (D, H, W)
        gathered = jax.vmap(  # over neighbors
            lambda p: _sample_border(
                jnp.moveaxis(s, 0, -1), p[..., 0], p[..., 1]
            )
        )(pos)  # (K, H, W, D)
        gathered = jnp.moveaxis(gathered, -1, 0)  # (D, K, H, W)
        return jnp.sum(gathered * weight, axis=1)  # (D, H, W)


class FeatureWeightNet(nn.Module):
    """Per-neighbor feature-similarity weights for adaptive evaluation
    (patchmatch.py:841): ref features gathered at the deformable neighbors,
    group-correlated with the center pixel, 1x1 convs -> sigmoid."""

    G: int

    @nn.compact
    def __call__(self, ref_feat, pos):  # ref_feat (H, W, C); pos (K, H, W, 2)
        H, W, C = ref_feat.shape
        K = pos.shape[0]
        nb = jax.vmap(lambda p: _sample_border(ref_feat, p[..., 0], p[..., 1]))(pos)
        nb_g = nb.reshape(K, H, W, self.G, C // self.G)
        ref_g = ref_feat.reshape(H, W, self.G, C // self.G)
        corr = jnp.mean(nb_g * ref_g[None], axis=-1)  # (K, H, W, G)
        x = ConvBnReLU(16, 1, name="conv0")(corr)
        x = ConvBnReLU(8, 1, name="conv1")(x)
        x = nn.Conv(1, (1, 1), name="similarity")(x)[..., 0]  # (K, H, W)
        return jax.nn.sigmoid(x)


_OFFSETS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _prop_base_offsets(num_neighbors: int, dilation: int):
    """Fixed propagation offsets as (dy, dx), patchmatch.py:442-468."""
    offs = [(dy * dilation, dx * dilation) for dy, dx in _OFFSETS8]
    if num_neighbors == 16:
        offs = offs + [(2 * dy, 2 * dx) for dy, dx in offs]
    elif num_neighbors != 8:
        raise NotImplementedError(num_neighbors)
    return offs


def _eval_base_offsets(num_neighbors: int, dilation: int):
    """Fixed evaluation offsets incl. center, dilation-1 (patchmatch.py:521)."""
    d = dilation - 1
    offs = [
        (-d, -d), (-d, 0), (-d, d), (0, -d), (0, 0), (0, d), (d, -d), (d, 0), (d, d)
    ]
    if num_neighbors == 17:
        offs = offs + [(2 * dy, 2 * dx) for dy, dx in offs if (dy, dx) != (0, 0)]
    elif num_neighbors != 9:
        raise NotImplementedError(num_neighbors)
    return offs


def _deform_positions(base_offsets, learned, H, W):
    """Deformable sample positions p + base + learned (patchmatch.py:484-502).

    learned: (H, W, 2K) with channel 2i = x offset, 2i+1 = y offset (the
    upstream offset-channel convention). Returns (K, H, W, 2) as (x, y)."""
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    pos = []
    for k, (dy, dx) in enumerate(base_offsets):
        sx = xx + dx + learned[..., 2 * k]
        sy = yy + dy + learned[..., 2 * k + 1]
        pos.append(jnp.stack([sx, sy], -1))
    return jnp.stack(pos)  # (K, H, W, 2)


def _depth_weight(samples, inv_d_min, inv_d_max, pos, interval_scale):
    """Per-(sample, neighbor) depth-difference weights (patchmatch.py:894):
    normalized inverse depth gathered at the neighbors; weight =
    sigmoid((2 - clamp(|diff|/interval, 0, 4)) * 2). Gradient-stopped."""
    D, H, W = samples.shape
    x = (1.0 / jnp.maximum(samples, 1e-9) - inv_d_min) / (inv_d_max - inv_d_min)
    x_img = jnp.moveaxis(x, 0, -1)  # (H, W, D)
    nb = jax.vmap(lambda p: _sample_border(x_img, p[..., 0], p[..., 1]))(pos)
    nb = jnp.moveaxis(nb, -1, 0)  # (D, K, H, W)
    diff = jnp.abs(nb - x[:, None]) / interval_scale
    w = jax.nn.sigmoid((2.0 - jnp.clip(diff, 0.0, 4.0)) * 2.0)
    return jax.lax.stop_gradient(w)


class PatchMatchStage(nn.Module):
    """One coarse-to-fine stage (patchmatch.py:345 PatchMatch)."""

    stage: int
    G: int
    num_sample: int  # local perturbation samples per iteration
    interval_scale: float
    iterations: int
    propagate_neighbors: int
    dilation: int
    random_init: bool = False
    evaluate_neighbors: int = 9

    @nn.compact
    def __call__(self, ref_feat, src_feats, K_ref, K_srcs, sRr, str_,
                 inv_d_min, inv_d_max, depth, view_weights, rng_seed=0):
        """ref_feat (H, W, C); src_feats (S, H, W, C); depth (H, W) or None;
        view_weights (S, H, W, 1) or None (computed here at stage 3).
        inv_d_min = 1/d_max, inv_d_max = 1/d_min (upstream naming: min/max of
        the inverse-depth RANGE bounds is inverted vs depth).
        Returns (depth (H, W), score (D, H, W), view_weights)."""
        H, W, C = ref_feat.shape
        similarity = SimilarityNet(name="similarity")
        feature_weight_net = FeatureWeightNet(self.G, name="feature_weight")
        pixelwise = PixelwiseNet(name="pixelwise") if self.stage == 3 else None

        has_propagation = self.propagate_neighbors > 0 and not (
            self.stage == 1 and self.iterations == 1
        )
        if has_propagation:
            propa_conv = nn.Conv(
                2 * self.propagate_neighbors, (3, 3),
                kernel_dilation=self.dilation,
                kernel_init=nn.initializers.zeros,
                name="propa_conv",
            )
            propa_pos = _deform_positions(
                _prop_base_offsets(self.propagate_neighbors, self.dilation),
                propa_conv(ref_feat), H, W,
            )
        eval_conv = nn.Conv(
            2 * self.evaluate_neighbors, (3, 3),
            kernel_dilation=self.dilation,
            kernel_init=nn.initializers.zeros,
            name="eval_conv",
        )
        eval_pos = _deform_positions(
            _eval_base_offsets(self.evaluate_neighbors, self.dilation),
            eval_conv(ref_feat), H, W,
        )
        feature_weight = feature_weight_net(
            jax.lax.stop_gradient(ref_feat), eval_pos
        )  # (K, H, W)

        score = None
        for it in range(1, self.iterations + 1):
            # --- depth sample generation (patchmatch.py:19 DepthInitialization)
            if self.random_init and it == 1:
                D = 48
                key = jax.random.PRNGKey(rng_seed)
                u = jax.random.uniform(key, (D, H, W))
                lev = jnp.arange(D, dtype=jnp.float32)[:, None, None]
                inv = inv_d_min + (lev + u) / D * (inv_d_max - inv_d_min)
                samples = 1.0 / jnp.maximum(inv, 1e-9)
            else:
                Dl = self.num_sample
                lev = jnp.arange(-(Dl // 2), Dl // 2, dtype=jnp.float32)[:, None, None]
                interval = (inv_d_max - inv_d_min) * self.interval_scale
                inv = 1.0 / jnp.maximum(depth, 1e-9) + lev * interval
                inv = jnp.clip(inv, inv_d_min, inv_d_max)
                samples = 1.0 / jnp.maximum(inv, 1e-9)
                # Adaptive propagation (skipped at the last stage-1 iteration,
                # patchmatch.py:699-700). Gathers the clamped current depth at
                # the deformable neighbor positions. (Upstream sorts the
                # concatenated samples by depth — a no-op for the softmax
                # expectation, so omitted.)
                if has_propagation and not (self.stage == 1 and it == self.iterations):
                    d_center = 1.0 / jnp.maximum(
                        jnp.clip(1.0 / jnp.maximum(depth, 1e-9), inv_d_min, inv_d_max),
                        1e-9,
                    )
                    prop = jax.vmap(
                        lambda p: _sample_border(
                            d_center[..., None], p[..., 0], p[..., 1]
                        )[..., 0]
                    )(propa_pos)  # (K, H, W)
                    samples = jnp.concatenate([samples, prop], axis=0)

            D = samples.shape[0]

            # --- group correlation against each src view (Evaluation)
            def corr_one_src(sf, Ks, R, t):
                warped = warp_src_feature(sf, K_ref, Ks, R, t, samples)
                ref_g = ref_feat.reshape(H, W, self.G, C // self.G)
                war_g = warped.reshape(D, H, W, self.G, C // self.G)
                return jnp.mean(war_g * ref_g[None], axis=-1)  # (D, H, W, G)

            corrs = jax.vmap(corr_one_src)(src_feats, K_srcs, sRr, str_)  # (S, D, H, W, G)

            if view_weights is None:
                # Pixel-wise view weights: stage-3 iteration 1 only, reused
                # (and x2-upsampled) by every later stage (net.py:256-298).
                view_weights = jax.vmap(pixelwise)(corrs)  # (S, H, W, 1)
            vw = jax.lax.stop_gradient(view_weights)
            wsum = jnp.sum(vw, axis=0) + 1e-6  # (H, W, 1)
            agg = jnp.sum(corrs * vw[:, None], axis=0) / wsum[None]  # (D, H, W, G)

            # --- adaptive evaluation: neighbor weights + aggregated score
            dw = _depth_weight(samples, inv_d_min, inv_d_max, eval_pos,
                               self.interval_scale)  # (D, K, H, W)
            weight = dw * feature_weight[None]
            weight = weight / jnp.maximum(
                jnp.sum(weight, axis=1, keepdims=True), 1e-12
            )
            score = similarity(agg, eval_pos, weight)  # (D, H, W)
            prob = jax.nn.softmax(score, axis=0)
            score = prob

            if self.stage == 1 and it == self.iterations:
                # Inverse-depth INDEX regression (patchmatch.py:324-334).
                idx = jnp.sum(
                    jnp.arange(D, dtype=jnp.float32)[:, None, None] * prob, axis=0
                )
                inv_lo = 1.0 / samples[0]   # largest depth -> smallest inverse
                inv_hi = 1.0 / samples[-1]  # smallest depth -> largest inverse
                depth = 1.0 / jnp.maximum(
                    inv_lo + idx / (D - 1) * (inv_hi - inv_lo), 1e-9
                )
            else:
                depth = jnp.sum(prob * samples, axis=0)

        return depth, score, view_weights


def _upsample2_nearest(t):
    """x2 nearest upsampling of leading 2 spatial dims of (H, W, ...) or the
    middle dims of (S, H, W, C)."""
    if t.ndim == 2:
        return jnp.repeat(jnp.repeat(t, 2, axis=0), 2, axis=1)
    if t.ndim == 4:  # (S, H, W, C)
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
    raise ValueError(t.shape)


class TransposeConvBnReLU(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) + folded BN + relu —
    the upstream Refinement deconv (net.py:91-95). Implemented as an
    lhs-dilated conv so the converter can map the flipped torch kernel."""

    ch: int

    @nn.compact
    def __call__(self, x):  # (H, W, C) -> (2H, 2W, ch)
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, x.shape[-1], self.ch)
        )
        b = self.param("bias", nn.initializers.zeros, (self.ch,))
        y = jax.lax.conv_general_dilated(
            x[None], k, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        return nn.relu(y + b)


class Refinement(nn.Module):
    """Image-guided depth refinement at full resolution (net.py:78-134)."""

    @nn.compact
    def __call__(self, image, depth, d_min, d_max):  # image (H, W, 3), depth (H/2, W/2)
        dn = (depth - d_min) / jnp.maximum(d_max - d_min, 1e-9)
        img_f = ConvBnReLU(8, name="conv0")(image[None])[0]
        d_f = ConvBnReLU(8, name="conv2")(ConvBnReLU(8, name="conv1")(dn[None, ..., None]))[0]
        d_up = TransposeConvBnReLU(8, name="deconv")(d_f)  # (H, W, 8)
        x = jnp.concatenate([d_up, img_f], axis=-1)  # deconv first (net.py:122)
        x = ConvBnReLU(8, name="conv3")(x[None])[0]
        res = nn.Conv(1, (3, 3), use_bias=False, name="res")(x[None])[0, ..., 0]
        dn_ref = _upsample2_nearest(dn) + res
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

        # Upstream naming (patchmatch.py:61-62): inverse_min_depth = 1/d_min
        # is the LARGE inverse bound; our inv_d_min/inv_d_max are the actual
        # min/max of the inverse-depth range.
        inv_d_min = 1.0 / d_max
        inv_d_max = 1.0 / d_min

        def scale_K(K, s):
            return jnp.asarray(
                [[K[0, 0] * s, 0.0, K[0, 2] * s],
                 [0.0, K[1, 1] * s, K[1, 2] * s],
                 [0.0, 0.0, 1.0]]
            )

        # Stage configs as upstream net.py:142-147 (lists indexed stage 1..3).
        stage_cfg = {
            3: dict(G=8, num_sample=16, interval_scale=0.025, iterations=2,
                    propagate_neighbors=16, dilation=2, random_init=True),
            2: dict(G=8, num_sample=8, interval_scale=0.0125, iterations=2,
                    propagate_neighbors=8, dilation=4),
            1: dict(G=4, num_sample=8, interval_scale=0.005, iterations=1,
                    propagate_neighbors=0, dilation=6),
        }

        depth = None
        view_weights = None
        score = None
        for stage in (3, 2, 1):
            s = 0.5**stage
            cfg = stage_cfg[stage]
            rf = ref_feats[f"stage_{stage}"][0]
            sf = src_feats[f"stage_{stage}"]
            Kr = scale_K(K_ref, s)
            Ks = jax.vmap(lambda K: scale_K(K, s))(K_srcs)
            pm = PatchMatchStage(stage=stage, **cfg, name=f"patchmatch_{stage}")
            depth, score, view_weights = pm(
                rf, sf, Kr, Ks, sRr, str_, inv_d_min, inv_d_max, depth, view_weights
            )
            if stage > 1:
                depth = _upsample2_nearest(jax.lax.stop_gradient(depth))
                view_weights = _upsample2_nearest(view_weights)

        # Photometric confidence (net.py:313-324): sum of the 4 depth bins
        # around the regressed index of the final score volume.
        D = score.shape[0]
        pad = jnp.concatenate(
            [jnp.zeros((1,) + score.shape[1:]), score,
             jnp.zeros((2,) + score.shape[1:])], axis=0
        )
        score_sum4 = jnp.stack([jnp.sum(pad[d:d + 4], axis=0) for d in range(D)])
        idx = jnp.sum(jnp.arange(D, dtype=jnp.float32)[:, None, None] * score, axis=0)
        idx = jnp.clip(idx.astype(jnp.int32), 0, D - 1)
        conf = jnp.take_along_axis(score_sum4, idx[None], axis=0)[0]
        conf_full = _upsample2_nearest(conf)

        depth = Refinement(name="refinement")(ref_img, depth, d_min, d_max)
        return depth, conf_full


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (official patchmatchnet.ckpt layout)
# ---------------------------------------------------------------------------


def convert_torch_checkpoint(path: str):
    """Official PatchmatchNet checkpoint -> flax params.

    Handles lightning checkpoints ({'state_dict' or 'model': ...}) and the
    'module.' DataParallel prefix. Eval-mode BatchNorms fold into the convs;
    the 1x1x1 Conv3d heads map onto 2D 1x1 convs directly; the Refinement
    ConvTranspose2d maps onto the lhs-dilated conv (kernel transposed to HWIO
    and spatially flipped), with its following BatchNorm folded in.
    """
    import torch

    payload = torch.load(path, map_location="cpu")
    sd = payload.get("state_dict", payload.get("model", payload))
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def _bn_fold(w, b, bn_prefix, axis=0):
        gamma = sd[f"{bn_prefix}.weight"].numpy()
        beta = sd[f"{bn_prefix}.bias"].numpy()
        mean = sd[f"{bn_prefix}.running_mean"].numpy()
        var = sd[f"{bn_prefix}.running_var"].numpy()
        s = gamma / np.sqrt(var + 1e-5)
        shape = [1] * w.ndim
        shape[axis] = -1
        return w * s.reshape(shape), (b - mean) * s + beta

    def conv(prefix, bn_prefix=None):
        w = sd[f"{prefix}.weight"].numpy()
        if w.ndim == 5:  # Conv3d 1x1x1 -> 2D
            w = w[..., 0]
        o = w.shape[0]
        b = sd[f"{prefix}.bias"].numpy() if f"{prefix}.bias" in sd else np.zeros(o, np.float32)
        if bn_prefix is not None:
            w, b = _bn_fold(w, b, bn_prefix, axis=0)
        k = np.transpose(w, (2, 3, 1, 0))  # (kh, kw, I, O)
        return {"kernel": k, "bias": b}

    def deconv(prefix, bn_prefix):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> lhs-dilated-conv
        # kernel: HWIO with both spatial dims flipped; BN folds on OUT chans.
        w = sd[f"{prefix}.weight"].numpy()  # (I, O, kh, kw)
        o = w.shape[1]
        b = np.zeros(o, np.float32)  # upstream deconv has bias=False
        w, b = _bn_fold(w, b, bn_prefix, axis=1)
        k = np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(0, 1)).copy()
        return {"kernel": k, "bias": b}

    def cbr(prefix):
        return {"conv": conv(f"{prefix}.conv", f"{prefix}.bn")}

    feature = {f"conv{i}": cbr(f"feature.conv{i}") for i in range(11)}
    feature["output1"] = conv("feature.output1")
    feature["output2"] = conv("feature.output2")
    feature["output3"] = conv("feature.output3")
    feature["inner1"] = conv("feature.inner1")
    feature["inner2"] = conv("feature.inner2")

    def head3(prefix, last):
        return {
            "conv0": cbr(f"{prefix}.conv0"),
            "conv1": cbr(f"{prefix}.conv1"),
            last: conv(f"{prefix}.{last}"),
        }

    def stage(i):
        base = f"patchmatch_{i}"
        p = {
            "similarity": head3(f"{base}.evaluation.similarity_net", "similarity"),
            "feature_weight": head3(f"{base}.feature_weight_net", "similarity"),
            "eval_conv": conv(f"{base}.eval_conv"),
        }
        if i == 3:
            p["pixelwise"] = head3(f"{base}.evaluation.pixel_wise_net", "conv2")
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
            "conv2": cbr("upsample_net.conv2"),
            "deconv": deconv("upsample_net.deconv", "upsample_net.bn"),
            "conv3": cbr("upsample_net.conv3"),
            "res": conv("upsample_net.res"),
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Pipeline-level densify driver (reference gtsfm/densify/mvs_patchmatchnet.py:55)
# ---------------------------------------------------------------------------


def densify_patchmatchnet(
    images,  # list of (H, W[,3]) arrays, same size, downscaled
    scene,
    checkpoint_path: str | None = None,
    allow_random_weights: bool = False,
    num_src_views: int = 4,
    max_points_per_view: int = 60000,
):
    """Full learned-MVS engine: per-reference-view PatchmatchNet depth
    inference + the same geometric-consistency fusion as the plane-sweep
    engine (reference thresholds, mvs_patchmatchnet.py:35-52: >=1 consistent
    source view, photometric confidence >= 0.8).

    View selection reuses plane_sweep.select_source_views (shared-track
    piecewise-Gaussian scoring — the reference's PatchmatchNetData view
    selection, densify/patchmatchnet_data.py). Returns a
    plane_sweep.DensifyResult so the pipeline treats both engines uniformly.
    """
    from gtsfm_tpu.densify import plane_sweep
    from gtsfm_tpu.geometry import cameras

    if checkpoint_path is not None:
        params = convert_torch_checkpoint(checkpoint_path)
    elif not allow_random_weights:
        raise ValueError(
            "patchmatchnet engine needs densify.patchmatchnet_checkpoint "
            "(or allow_random_weights for tests)"
        )
    else:
        params = None

    N = scene.num_cameras_padded
    cam_mask = np.asarray(scene.camera_mask) > 0
    # RGB in [0,1], cropped to a multiple of 8 (FeatureNet stride).
    rgb_list = []
    for im in images:
        a = np.asarray(im, np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        if a.ndim == 2:
            a = np.stack([a] * 3, -1)
        h8, w8 = (a.shape[0] // 8) * 8, (a.shape[1] // 8) * 8
        rgb_list.append(a[:h8, :w8])
    rgb = jnp.stack(rgb_list)
    H, W = rgb.shape[1:3]
    K_all = np.asarray(jax.vmap(cameras.K_from_bundler)(scene.cal))
    wR = np.asarray(scene.wRi)
    wt = np.asarray(scene.wti)

    model = PatchmatchNet()
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0),
            rgb[0], rgb[: min(num_src_views, rgb.shape[0])],
            jnp.asarray(K_all[0]),
            jnp.asarray(K_all[: min(num_src_views, rgb.shape[0])]),
            jnp.tile(jnp.eye(3), (min(num_src_views, rgb.shape[0]), 1, 1)),
            jnp.zeros((min(num_src_views, rgb.shape[0]), 3)),
            jnp.asarray(1.0), jnp.asarray(10.0),
        )["params"]

    @jax.jit
    def infer(ref, srcs, Kr, Ks, sRr, str_, d_min, d_max):
        return model.apply({"params": params}, ref, srcs, Kr, Ks, sRr, str_, d_min, d_max)

    src_table = plane_sweep.select_source_views(scene, num_src_views)
    depth_maps = np.zeros((N, H, W), np.float32)
    conf_maps = np.zeros((N, H, W), np.float32)
    for i in range(N):
        if not cam_mask[i]:
            continue
        srcs = src_table[i][src_table[i] >= 0]
        if srcs.size == 0:
            continue
        srcs = np.resize(srcs, num_src_views)
        d_min, d_max = plane_sweep.depth_range_from_scene(scene, i)
        sRr = np.stack([wR[s].T @ wR[i] for s in srcs]).astype(np.float32)
        str_ = np.stack([wR[s].T @ (wt[i] - wt[s]) for s in srcs]).astype(np.float32)
        depth, conf = infer(
            rgb[i], rgb[jnp.asarray(srcs)], jnp.asarray(K_all[i], jnp.float32),
            jnp.asarray(K_all[srcs], jnp.float32), jnp.asarray(sRr),
            jnp.asarray(str_), jnp.asarray(d_min, jnp.float32),
            jnp.asarray(d_max, jnp.float32),
        )
        depth_maps[i] = np.asarray(depth)
        conf_maps[i] = np.asarray(conf)

    # Fusion — identical to the plane-sweep engine (one code path for both).
    all_pts, all_rgb = [], []
    total_checked = 0
    for i in range(N):
        if not cam_mask[i]:
            continue
        srcs = src_table[i][src_table[i] >= 0]
        if srcs.size == 0:
            continue
        count = np.asarray(
            plane_sweep.geometric_consistency(
                jnp.asarray(depth_maps[i]), jnp.asarray(K_all[i]),
                jnp.asarray(wR[i]), jnp.asarray(wt[i]),
                jnp.asarray(depth_maps[srcs]), jnp.asarray(K_all[srcs]),
                jnp.asarray(wR[srcs]), jnp.asarray(wt[srcs]),
            )
        )
        keep = (count >= plane_sweep.MIN_CONSISTENT_VIEWS) & (
            conf_maps[i] >= plane_sweep.MIN_CONFIDENCE
        )
        ys, xs = np.nonzero(keep)
        total_checked += keep.size
        if ys.size > max_points_per_view:
            sel = np.random.default_rng(0).choice(
                ys.size, max_points_per_view, replace=False
            )
            ys, xs = ys[sel], xs[sel]
        d = depth_maps[i][ys, xs]
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
        Xc = (np.linalg.inv(K_all[i]) @ pix.T).T * d[:, None]
        Xw = (wR[i] @ Xc.T).T + wt[i]
        all_pts.append(Xw.astype(np.float32))
        im8 = (rgb_list[i] * 255).astype(np.uint8)
        all_rgb.append(im8[ys, xs])

    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3), np.float32)
    colors = np.concatenate(all_rgb) if all_rgb else np.zeros((0, 3), np.uint8)
    return plane_sweep.DensifyResult(
        points=pts, rgb=colors,
        metrics={
            "num_dense_points": int(pts.shape[0]),
            "fill_fraction": float(pts.shape[0] / max(total_checked, 1)),
        },
    )
