"""Plane-sweep multi-view stereo, fully batched on device.

TPU-native densification engine with the reference's MVS contract
(gtsfm/densify/mvs_base.py: densify(images, sfm_result) -> (points, rgb,
metrics); gtsfm/densify/mvs_patchmatchnet.py:55): view selection from shared
SfM tracks, per-reference-view depth inference, geometric-consistency
filtering (reproj < 1 px, relative depth diff < 0.01, >= 1 consistent source
view — thresholds mirror mvs_patchmatchnet.py:35-52) and fused point cloud.

The depth engine is classical plane-sweep rather than a learned network: D
inverse-depth hypotheses spanning the sparse-point range, per-plane homography
warps of source views (one batched bilinear gather), 5x5 ZNCC photometric
cost on the VPU, top-k source aggregation, winner-take-all + parabolic depth
refinement and photometric confidence. (A PatchmatchNet Flax port can slot in
behind the same API; plane-sweep maps better onto the MXU/VPU than learned
patchmatch's irregular propagation and has no pretrained-weight dependency.)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.scene import SceneData
from gtsfm_tpu.geometry import cameras

# Fusion thresholds (reference mvs_patchmatchnet.py:35-52).
MAX_REPROJ_ERROR_PX = 1.0
MAX_RELATIVE_DEPTH_DIFF = 0.01
MIN_CONFIDENCE = 0.8
MIN_CONSISTENT_VIEWS = 1


def pairwise_view_scores(scene: SceneData, max_track_len: int = 16) -> np.ndarray:
    """(N, N) pairwise view-selection scores: for every camera pair, the sum
    over shared tracks of the piecewise-Gaussian of the triangulation angle at
    the track's 3D point (reference patchmatchnet_data.py:85-149, MVSNet view
    selection). Vectorized over the padded track view instead of the
    reference's per-track Python loop."""
    from gtsfm_tpu.common.scene import tracks_to_padded
    from gtsfm_tpu.densify import mvs_utils

    N = scene.num_cameras_padded
    cam_idx, _, mask = tracks_to_padded(scene, max_track_len)  # (T, L)
    pts = np.asarray(scene.points, np.float64)  # (T, 3)
    tmask = np.asarray(scene.track_mask) > 0
    centers = np.asarray(scene.wti, np.float64)  # (N, 3)

    # Rays from each observing camera to the track point: (T, L, 3).
    rays = pts[:, None, :] - centers[cam_idx]
    rays /= np.maximum(np.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    # Pairwise slot angles within each track: (T, L, L).
    dots = np.clip(np.einsum("tad,tbd->tab", rays, rays), -1.0, 1.0)
    theta = np.rad2deg(np.arccos(dots))
    score = mvs_utils.piecewise_gaussian(theta)
    pm = (mask[:, :, None] * mask[:, None, :]) * tmask[:, None, None]
    # Zero the diagonal (a slot paired with itself) and same-camera slot pairs.
    same_cam = cam_idx[:, :, None] == cam_idx[:, None, :]
    score = np.where(same_cam, 0.0, score * pm)

    pair_scores = np.zeros((N, N))
    np.add.at(
        pair_scores,
        (
            np.broadcast_to(cam_idx[:, :, None], score.shape).ravel(),
            np.broadcast_to(cam_idx[:, None, :], score.shape).ravel(),
        ),
        score.ravel(),
    )
    np.fill_diagonal(pair_scores, -np.inf)
    return pair_scores


def select_source_views(scene: SceneData, num_views: int = 4) -> np.ndarray:
    """Rank source views per reference view by the summed piecewise-Gaussian
    triangulation-angle score over shared tracks (reference
    patchmatchnet_data.py:85-153 view-selection).

    Returns (N, num_views) int32 of source view indices (-1 padding).
    """
    pair_scores = pairwise_view_scores(scene)
    N = pair_scores.shape[0]
    out = np.full((N, num_views), -1, np.int32)
    order = np.argsort(-pair_scores, axis=1)
    for i in range(N):
        k = 0
        for j in order[i]:
            if pair_scores[i, j] <= 0 or k >= num_views:
                break
            out[i, k] = j
            k += 1
    return out


def depth_range_from_scene(scene: SceneData, ref_idx: int) -> tuple[float, float]:
    """Min/max depth of sparse points seen by the reference view, padded 25%."""
    mc = np.asarray(scene.meas_cam)
    mt = np.asarray(scene.meas_track)
    mm = np.asarray(scene.meas_mask) > 0
    sel = (mc == ref_idx) & mm
    pts = np.asarray(scene.points)[mt[sel]]
    wRi = np.asarray(scene.wRi[ref_idx])
    wti = np.asarray(scene.wti[ref_idx])
    z = (pts - wti) @ wRi[:, 2]
    z = z[z > 0]
    if z.size == 0:
        return 0.1, 100.0
    lo, hi = np.percentile(z, [2, 98])
    return float(max(lo * 0.75, 1e-3)), float(hi * 1.25)


@functools.partial(jax.jit, static_argnames=("num_depths",))
def plane_sweep_depth(
    ref_img: jnp.ndarray,  # (H, W) grayscale
    src_imgs: jnp.ndarray,  # (S, H, W)
    K_ref: jnp.ndarray,  # (3, 3)
    K_src: jnp.ndarray,  # (S, 3, 3)
    sRr: jnp.ndarray,  # (S, 3, 3) src_R_ref
    str_: jnp.ndarray,  # (S, 3) src_t_ref
    d_min: jnp.ndarray,
    d_max: jnp.ndarray,
    num_depths: int = 64,
):
    """Returns (depth (H, W), confidence (H, W)).

    Coarse-to-fine sweep (r3): the cost volume's bilinear warps are
    gather-bound on TPU (~100M samples/s; a full-resolution D-plane sweep
    is 314M samples = a ~3 s floor at VGA). Stage 1 sweeps ALL depth
    planes at quarter resolution (1/16 the samples); stage 2 refines the
    upsampled winning index with 5 per-pixel depth planes at full
    resolution — ~7x fewer gathers for the same inverse-depth resolution.

    Cost: 5x5 ZNCC between ref and each warped src; per-pixel aggregation =
    mean of the best half of sources; winner-take-all over depths with
    parabolic refinement; confidence = NCC margin.
    """
    if num_depths < 5:
        # Stage 2 clips the coarse winner to [2, D-3]; below 5 planes the
        # bounds invert and jnp.clip would silently return garbage indices.
        raise ValueError(f"plane_sweep_depth needs num_depths >= 5, got {num_depths}")
    H, W = ref_img.shape
    S = src_imgs.shape[0]
    D = num_depths
    inv_lo, inv_hi = 1.0 / d_max, 1.0 / d_min

    def depth_of_index(i):
        return 1.0 / jnp.maximum(inv_lo + (inv_hi - inv_lo) * i / (D - 1), 1e-9)

    def zncc_maps(a, b):
        """5x5 ZNCC between two images, same shape."""
        # Separable box blur as Toeplitz MATMULS (zero-pad semantics match
        # the 'SAME' conv this replaces): a 1-channel conv cannot tile onto
        # the MXU and lowered to a scalar path — the 1280 such convs across
        # (depth, source) made plane-sweep ~5 s/map (roofline r3).
        from gtsfm_tpu.frontend.sift import _toeplitz_blur_matrix

        k1 = np.ones(5, np.float32) / 5.0
        By = jnp.asarray(_toeplitz_blur_matrix(a.shape[0], k1, pad="zero"))
        Bx = jnp.asarray(_toeplitz_blur_matrix(a.shape[1], k1, pad="zero"))

        def blur(x):
            return By @ x @ Bx.T

        ma, mb = blur(a), blur(b)
        va = blur(a * a) - ma * ma
        vb = blur(b * b) - mb * mb
        cov = blur(a * b) - ma * mb
        return cov / jnp.sqrt(jnp.maximum(va * vb, 1e-8))

    def make_cost(ref, srcs, Kr, Ks):
        """cost(dmap (h, w)) -> ZNCC score (h, w) at per-pixel depths."""
        h, w = ref.shape
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)
        rays = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(Kr), pix)

        def sample(img, u, v):
            # Flat linear-index gather ((y, x)-tuple indexing lowers to a
            # ~10x slower general gather; same fix as frontend/sift.py).
            flat = img.ravel()
            u = jnp.clip(u, 0.0, w - 1.001)
            v = jnp.clip(v, 0.0, h - 1.001)
            x0 = jnp.floor(u).astype(jnp.int32)
            y0 = jnp.floor(v).astype(jnp.int32)
            fu = u - x0
            fv = v - y0
            base = y0 * w + x0
            return (
                flat[base] * (1 - fv) * (1 - fu)
                + flat[base + 1] * (1 - fv) * fu
                + flat[base + w] * fv * (1 - fu)
                + flat[base + w + 1] * fv * fu
            )

        def cost(dmap):
            X = rays * dmap[..., None]  # (h, w, 3) ref-cam frame
            Xs = jnp.einsum("sij,hwj->shwi", sRr, X) + str_[:, None, None, :]
            z = jnp.maximum(Xs[..., 2], 1e-6)
            uv = jnp.einsum("sij,shwj->shwi", Ks, Xs / z[..., None])
            u = uv[..., 0]
            v = uv[..., 1]
            inb = (u >= 0) & (u < w - 1) & (v >= 0) & (v < h - 1) & (Xs[..., 2] > 0)
            warped = jax.vmap(sample)(srcs, u, v)  # (S, h, w)
            ncc = jax.vmap(lambda wi: zncc_maps(ref, wi))(warped)
            score = jnp.where(inb, ncc, -1.0)
            k = max(S // 2, 1)  # mean of best half (occlusion robustness)
            top, _ = jax.lax.top_k(jnp.moveaxis(score, 0, -1), k)
            return jnp.mean(top, -1)  # (h, w)

        return cost

    # ---- Stage 1: full depth sweep at quarter resolution.
    F = 4
    Hc, Wc = H // F, W // F

    def pool4(img):
        return jnp.mean(
            img[: Hc * F, : Wc * F].reshape(Hc, F, Wc, F), axis=(1, 3)
        )

    # Pixel-center mapping x_full = F*x_coarse + (F-1)/2 => K_c = S @ K.
    S4 = jnp.asarray(
        [[1.0 / F, 0.0, -(F - 1) / (2.0 * F)],
         [0.0, 1.0 / F, -(F - 1) / (2.0 * F)],
         [0.0, 0.0, 1.0]], jnp.float32,
    )
    cost_c = make_cost(
        pool4(ref_img), jax.vmap(pool4)(src_imgs),
        S4 @ K_ref, jnp.einsum("ij,sjk->sik", S4, K_src),
    )
    ones_c = jnp.ones((Hc, Wc), jnp.float32)
    scores_c = jax.lax.map(
        lambda i: cost_c(depth_of_index(i) * ones_c),
        jnp.arange(D, dtype=jnp.float32),
    )  # (D, Hc, Wc)
    best_c = jnp.argmax(scores_c, axis=0).astype(jnp.float32)  # (Hc, Wc)

    # ---- Stage 2: refine 5 planes around the upsampled winner, full res.
    best_f = jnp.repeat(jnp.repeat(best_c, F, 0), F, 1)
    best_f = jnp.pad(
        best_f, ((0, H - best_f.shape[0]), (0, W - best_f.shape[1])),
        mode="edge",
    )
    bm = jnp.clip(best_f, 2.0, D - 3.0)  # (H, W)
    cost_f = make_cost(ref_img, src_imgs, K_ref, K_src)
    offs = jnp.arange(-2.0, 3.0)  # 5 refinement planes
    scores5 = jax.lax.map(lambda o: cost_f(depth_of_index(bm + o)), offs)
    # (5, H, W)
    best5 = jnp.argmax(scores5, axis=0)  # in [0, 5)
    b5 = jnp.clip(best5, 1, 3)
    s0 = jnp.take_along_axis(scores5, (b5 - 1)[None], 0)[0]
    s1 = jnp.take_along_axis(scores5, b5[None], 0)[0]
    s2 = jnp.take_along_axis(scores5, (b5 + 1)[None], 0)[0]
    denom = s0 - 2 * s1 + s2
    frac = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (s0 - s2) / denom, 0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    idx = jnp.clip(bm + (b5.astype(jnp.float32) - 2.0) + frac, 0.0, D - 1.0)
    depth = depth_of_index(idx)

    best_score = jnp.max(scores5, axis=0)
    # Confidence: margin of the winning NCC (in [0, 1] approx).
    conf = jnp.clip(0.5 * (best_score + 1.0), 0.0, 1.0)
    return depth, conf


@functools.partial(jax.jit, static_argnames=())
def geometric_consistency(
    depth_ref, K_ref, wR_ref, wt_ref,
    depth_srcs, K_srcs, wR_srcs, wt_srcs,
):
    """Count source views whose depth map agrees with the reference depth
    (reproj < 1 px AND relative depth diff < 0.01 — reference thresholds).

    depth_ref: (H, W); depth_srcs: (S, H, W). Returns (count (H, W))."""
    H, W = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)
    X_ref = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K_ref), pix) * depth_ref[..., None]
    X_w = jnp.einsum("ij,hwj->hwi", wR_ref, X_ref) + wt_ref  # world

    def check(depth_s, K_s, wR_s, wt_s):
        Xs = jnp.einsum("ji,hwj->hwi", wR_s, X_w - wt_s)  # world -> src cam
        z = jnp.maximum(Xs[..., 2], 1e-6)
        uv = jnp.einsum("ij,hwj->hwi", K_s, Xs / z[..., None])
        u, v = uv[..., 0], uv[..., 1]
        inb = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1) & (Xs[..., 2] > 0)
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        d_s = depth_s[vi, ui]
        # Backproject src pixel at its depth, reproject into ref.
        pix_s = jnp.stack([u, v, jnp.ones_like(u)], -1)
        Xs2 = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K_s), pix_s) * d_s[..., None]
        Xw2 = jnp.einsum("ij,hwj->hwi", wR_s, Xs2) + wt_s
        Xr2 = jnp.einsum("ji,hwj->hwi", wR_ref, Xw2 - wt_ref)
        z2 = jnp.maximum(Xr2[..., 2], 1e-6)
        uv2 = jnp.einsum("ij,hwj->hwi", K_ref, Xr2 / z2[..., None])
        reproj = jnp.sqrt((uv2[..., 0] - xs) ** 2 + (uv2[..., 1] - ys) ** 2)
        rel_depth = jnp.abs(z2 - depth_ref) / jnp.maximum(depth_ref, 1e-6)
        ok = inb & (reproj < MAX_REPROJ_ERROR_PX) & (rel_depth < MAX_RELATIVE_DEPTH_DIFF)
        return ok.astype(jnp.float32)

    counts = jax.vmap(check)(depth_srcs, K_srcs, wR_srcs, wt_srcs)
    return jnp.sum(counts, axis=0)


@dataclasses.dataclass
class DensifyResult:
    points: np.ndarray  # (P, 3)
    rgb: np.ndarray  # (P, 3) uint8
    metrics: dict


def densify(
    images: list[np.ndarray],  # (H, W[,3]) per camera, same size, downscaled
    scene: SceneData,
    num_depths: int = 64,
    num_src_views: int = 4,
    max_points_per_view: int = 60000,
) -> DensifyResult:
    """Full MVS: per-view plane sweep + consistency fusion -> point cloud."""
    from gtsfm_tpu.common.image import to_grayscale

    N = scene.num_cameras_padded
    cam_mask = np.asarray(scene.camera_mask) > 0
    gray = jnp.stack([jnp.asarray(to_grayscale(im)) for im in images])
    H, W = gray.shape[1:]
    K_all = np.asarray(jax.vmap(cameras.K_from_bundler)(scene.cal))
    wR = np.asarray(scene.wRi)
    wt = np.asarray(scene.wti)

    src_table = select_source_views(scene, num_src_views)
    depth_maps = np.zeros((N, H, W), np.float32)
    conf_maps = np.zeros((N, H, W), np.float32)

    for i in range(N):
        if not cam_mask[i]:
            continue
        srcs = src_table[i][src_table[i] >= 0]
        if srcs.size == 0:
            continue
        srcs = np.resize(srcs, num_src_views)  # repeat-pad to fixed size
        d_min, d_max = depth_range_from_scene(scene, i)
        # src_T_ref = inv(wTs) * wTr
        sRr = np.stack([wR[s].T @ wR[i] for s in srcs])
        str_ = np.stack([wR[s].T @ (wt[i] - wt[s]) for s in srcs])
        depth, conf = plane_sweep_depth(
            gray[i], gray[jnp.asarray(srcs)], jnp.asarray(K_all[i]),
            jnp.asarray(K_all[srcs]), jnp.asarray(sRr.astype(np.float32)),
            jnp.asarray(str_.astype(np.float32)),
            jnp.asarray(d_min), jnp.asarray(d_max), num_depths=num_depths,
        )
        depth_maps[i] = np.asarray(depth)
        conf_maps[i] = np.asarray(conf)

    # Fusion.
    all_pts, all_rgb = [], []
    total_checked = 0
    for i in range(N):
        if not cam_mask[i]:
            continue
        srcs = src_table[i][src_table[i] >= 0]
        if srcs.size == 0:
            continue
        count = np.asarray(
            geometric_consistency(
                jnp.asarray(depth_maps[i]), jnp.asarray(K_all[i]),
                jnp.asarray(wR[i]), jnp.asarray(wt[i]),
                jnp.asarray(depth_maps[srcs]), jnp.asarray(K_all[srcs]),
                jnp.asarray(wR[srcs]), jnp.asarray(wt[srcs]),
            )
        )
        keep = (count >= MIN_CONSISTENT_VIEWS) & (conf_maps[i] >= MIN_CONFIDENCE)
        ys, xs = np.nonzero(keep)
        total_checked += keep.size
        if ys.size > max_points_per_view:
            sel = np.random.default_rng(0).choice(ys.size, max_points_per_view, replace=False)
            ys, xs = ys[sel], xs[sel]
        d = depth_maps[i][ys, xs]
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
        Xc = (np.linalg.inv(K_all[i]) @ pix.T).T * d[:, None]
        Xw = (wR[i] @ Xc.T).T + wt[i]
        all_pts.append(Xw.astype(np.float32))
        img = images[i]
        if img.ndim == 3:
            all_rgb.append(img[ys, xs])
        else:
            g = (img[ys, xs] * 255).astype(np.uint8)
            all_rgb.append(np.stack([g, g, g], -1))

    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(all_rgb) if all_rgb else np.zeros((0, 3), np.uint8)
    return DensifyResult(
        points=pts,
        rgb=rgb,
        metrics={
            "num_dense_points": int(pts.shape[0]),
            "fill_fraction": float(pts.shape[0] / max(total_checked, 1)),
        },
    )
