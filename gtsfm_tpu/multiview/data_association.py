"""Data association: RANSAC track triangulation with typed exit codes.

TPU-native replacement for the reference's Point3dInitializer +
DataAssociation (gtsfm/data_association/point3d_initializer.py:117,
data_assoc.py:42). The reference loops tracks in Python, batching them into
<= 1000 Dask tasks (data_assoc.py:39); here EVERY track triangulates in one
program, and RANSAC-over-measurement-pairs enumerates ALL pairs per track
(L*(L-1)/2 hypotheses, masked) instead of sampling — for SfM track lengths
(L <= ~30) exhaustive enumeration is cheaper than the reference's sampled
2749-hypothesis cap and strictly more accurate.

Exit codes mirror TriangulationExitCode (point3d_initializer.py:36):
SUCCESS / CHEIRALITY_FAILURE / EXCEEDS_REPROJ_THRESHOLD /
INSUFFICIENT_MEASUREMENTS / INSUFFICIENT_ANGLE.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import cameras, triangulation


class TriangulationExitCode(enum.IntEnum):
    SUCCESS = 0
    CHEIRALITY_FAILURE = 1
    INSUFFICIENT_MEASUREMENTS = 2
    EXCEEDS_REPROJ_THRESHOLD = 3
    INSUFFICIENT_ANGLE = 4


class TriangulationResult(NamedTuple):
    points: jnp.ndarray  # (T, 3)
    inlier_mask: jnp.ndarray  # (T, L) per-measurement inliers
    exit_codes: jnp.ndarray  # (T,) int32 TriangulationExitCode
    best_num_inliers: jnp.ndarray  # (T,)


@functools.partial(
    jax.jit,
    static_argnames=(
        "reproj_thresh_px", "min_tri_angle_deg", "use_ransac",
        "max_hypotheses", "track_chunk",
    ),
)
def triangulate_tracks_robust(
    wRi: jnp.ndarray,  # (N, 3, 3) global camera rotations
    wti: jnp.ndarray,  # (N, 3)
    cal: jnp.ndarray,  # (N, 5)
    cam_idx: jnp.ndarray,  # (T, L) int32 per-measurement camera
    uv: jnp.ndarray,  # (T, L, 2)
    mask: jnp.ndarray,  # (T, L)
    reproj_thresh_px: float = 10.0,  # reference deep_front_end.yaml:84
    min_tri_angle_deg: float = 1.0,
    use_ransac: bool = True,
    max_hypotheses: int = 128,  # reference caps RANSAC hypotheses (DA config
    # <=100, point3d_initializer.py:102-114 formula cap ~2749); exhaustive
    # pair enumeration is used only while C(L,2) fits under this cap —
    # long tracks (large scenes) would otherwise build a (T*C(L,2), L, 3, 4)
    # hypothesis tensor that overflows device memory.
    seed: int | jnp.ndarray = 0,  # PRNG seed (or key) for the sampled
    # long-track hypothesis draw; default 0 keeps runs deterministic, callers
    # and tests can reseed to decorrelate hypothesis samples.
    track_chunk: int = 8192,  # tracks per sequential lax.map slab: the
    # one-shot hypothesis tensors scale T x C(L,2) x L and OOMed the chip at
    # the 1024-image scale (136k tracks x 66 hyps x L=12 -> an 18.4 GB
    # buffer, r5); chunking bounds peak HBM at any scene size with
    # identical results.
) -> TriangulationResult:
    T, L = cam_idx.shape
    if T > track_chunk:
        pad = (-T) % track_chunk
        nc = (T + pad) // track_chunk

        def padt(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        if isinstance(seed, jnp.ndarray) and (
            seed.dtype == jnp.uint32
            or jnp.issubdtype(seed.dtype, jax.dtypes.prng_key)
        ):
            key = seed
        else:
            key = jax.random.PRNGKey(int(seed))
        keys = jax.random.split(key, nc)

        def body(args):
            ci_, uv_, m_, k_ = args
            return _triangulate_chunk(
                wRi, wti, cal, ci_, uv_, m_, reproj_thresh_px,
                min_tri_angle_deg, use_ransac, max_hypotheses, k_,
            )

        res = jax.lax.map(
            body,
            (padt(cam_idx).reshape(nc, track_chunk, L),
             padt(uv).reshape(nc, track_chunk, L, 2),
             padt(mask).reshape(nc, track_chunk, L),
             keys),
        )
        return jax.tree_util.tree_map(
            lambda a: a.reshape((nc * track_chunk,) + a.shape[2:])[:T], res
        )
    return _triangulate_chunk(
        wRi, wti, cal, cam_idx, uv, mask, reproj_thresh_px,
        min_tri_angle_deg, use_ransac, max_hypotheses, seed,
    )


def _triangulate_chunk(
    wRi, wti, cal, cam_idx, uv, mask, reproj_thresh_px,
    min_tri_angle_deg, use_ransac, max_hypotheses, seed,
) -> TriangulationResult:
    T, L = cam_idx.shape
    K = jax.vmap(cameras.K_from_bundler)(cal)
    P_all = jax.vmap(triangulation.projection_matrix)(wRi, wti, K)  # (N, 3, 4)
    P_t = P_all[cam_idx]  # (T, L, 3, 4)
    wRi_t = wRi[cam_idx]
    wti_t = wti[cam_idx]
    cal_t = cal[cam_idx]

    def reproj_err(X):
        """X: (T, 3) -> per-measurement pixel error + depth (T, L)."""
        pred, depth = cameras.project_bundler(wRi_t, wti_t, cal_t, X[:, None, :])
        return jnp.linalg.norm(pred - uv, axis=-1), depth

    if use_ransac and (L * (L - 1)) // 2 <= max_hypotheses:
        # Small tracks: enumerate all measurement pairs (i < j < L), masked.
        ii, jj = np.triu_indices(L, k=1)
        ii = jnp.asarray(ii)
        jj = jnp.asarray(jj)  # (H,)
        H = ii.shape[0]
        pair_valid = mask[:, ii] * mask[:, jj]  # (T, H)

        # Two-view DLT per hypothesis: mask all but rows ii/jj.
        hyp_mask = jnp.zeros((H, L)).at[jnp.arange(H), ii].set(1.0)
        hyp_mask = hyp_mask.at[jnp.arange(H), jj].set(1.0)  # (H, L)
        m_hyp = mask[:, None, :] * hyp_mask[None]  # (T, H, L)
        P_hyp = jnp.broadcast_to(P_t[:, None], (T, H, L, 3, 4))
        uv_hyp = jnp.broadcast_to(uv[:, None], (T, H, L, 2))
        X_hyp = triangulation.triangulate_tracks_dlt(
            P_hyp.reshape(T * H, L, 3, 4), uv_hyp.reshape(T * H, L, 2),
            m_hyp.reshape(T * H, L),
        ).reshape(T, H, 3)

        # Score each hypothesis against all measurements.
        pred, depth = cameras.project_bundler(
            wRi_t[:, None], wti_t[:, None], cal_t[:, None], X_hyp[:, :, None, :]
        )  # (T, H, L, 2)
        err_h = jnp.linalg.norm(pred - uv[:, None], axis=-1)
        inl_h = (err_h < reproj_thresh_px) & (depth > 0) & (mask[:, None, :] > 0)
        counts = jnp.sum(inl_h, axis=-1) * (pair_valid > 0)  # (T, H)
        best = jnp.argmax(counts, axis=-1)  # (T,)
        best_inl = jnp.take_along_axis(
            inl_h, best[:, None, None], axis=1
        )[:, 0].astype(uv.dtype)  # (T, L)
        best_count = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
        tri_mask = best_inl
    elif use_ransac:
        # Long tracks: per-track uniform sampling of measurement pairs
        # (RANSAC_SAMPLE_UNIFORM, reference point3d_initializer.py:143),
        # exploiting that measurements are slot-packed (slots [0, n_t)).
        C = 16  # hypotheses scored per chunk
        K2 = ((max_hypotheses + C - 1) // C) * C
        n_t = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (T,)
        if isinstance(seed, jnp.ndarray) and (
            seed.dtype == jnp.uint32
            or jnp.issubdtype(seed.dtype, jax.dtypes.prng_key)
        ):
            key = seed  # raw uint32 key array OR new-style typed key
        else:
            key = jax.random.PRNGKey(int(seed))
        u = jax.random.uniform(key, (T, K2, 2))
        na = jnp.maximum(n_t, 1)[:, None]
        a = jnp.minimum((u[..., 0] * na).astype(jnp.int32), na - 1)  # (T, K2)
        nb = jnp.maximum(n_t - 1, 1)[:, None]
        b = jnp.minimum((u[..., 1] * nb).astype(jnp.int32), nb - 1)
        b = b + (b >= a)  # skip the diagonal -> b in [0, n_t) \ {a}
        b = jnp.minimum(b, jnp.maximum(n_t[:, None] - 1, 0))
        pair_valid = ((n_t >= 2)[:, None] & (a != b)).astype(uv.dtype)

        def take2(arr, idx):
            """arr (T, L, ...) gathered at idx (T, K2) -> (T, K2, ...)."""
            ix = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
            return jnp.take_along_axis(arr, ix, axis=1)

        P_pair = jnp.stack([take2(P_t, a), take2(P_t, b)], axis=2)  # (T,K2,2,3,4)
        uv_pair = jnp.stack([take2(uv, a), take2(uv, b)], axis=2)  # (T,K2,2,2)
        X_hyp = triangulation.triangulate_tracks_dlt(
            P_pair.reshape(T * K2, 2, 3, 4), uv_pair.reshape(T * K2, 2, 2),
            jnp.ones((T * K2, 2), uv.dtype),
        ).reshape(T, K2, 3)

        # Score hypotheses against all measurements in chunks: one shot would
        # materialize (T, K2, L, 2) activations — chunking keeps the scoring
        # tensor ~L/chunk smaller with identical results.
        G = K2 // C
        Xg = X_hyp.reshape(T, G, C, 3).transpose(1, 0, 2, 3)  # (G, T, C, 3)

        def score(Xc):  # (T, C, 3) -> (T, C) inlier counts
            pred_c, depth_c = cameras.project_bundler(
                wRi_t[:, None], wti_t[:, None], cal_t[:, None], Xc[:, :, None, :]
            )
            err_c = jnp.linalg.norm(pred_c - uv[:, None], axis=-1)
            inl_c = (
                (err_c < reproj_thresh_px) & (depth_c > 0) & (mask[:, None, :] > 0)
            )
            return jnp.sum(inl_c, axis=-1)

        counts = jax.lax.map(score, Xg).transpose(1, 0, 2).reshape(T, K2)
        counts = counts * pair_valid.astype(counts.dtype)
        best = jnp.argmax(counts, axis=-1)  # (T,)
        X_best = jnp.take_along_axis(X_hyp, best[:, None, None], axis=1)[:, 0]
        pred_b, depth_b = cameras.project_bundler(
            wRi_t, wti_t, cal_t, X_best[:, None, :]
        )
        err_b = jnp.linalg.norm(pred_b - uv, axis=-1)
        best_inl = (
            (err_b < reproj_thresh_px) & (depth_b > 0) & (mask > 0)
        ).astype(uv.dtype)
        best_count = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
        tri_mask = best_inl
    else:
        tri_mask = mask
        best_count = jnp.sum(mask, axis=-1)

    # Final DLT on the inlier set + GN refinement.
    X = triangulation.triangulate_tracks_dlt(P_t, uv, tri_mask)
    X = triangulation.refine_tracks_gn(wRi_t, wti_t, cal_t, uv, tri_mask, X, iters=5)

    err, depth = reproj_err(X)
    inlier = (err < reproj_thresh_px) & (depth > 0) & (mask > 0)
    inlier_f = inlier.astype(uv.dtype)
    n_inl = jnp.sum(inlier_f, axis=-1)

    # Triangulation angle on the inlier set.
    centers = wti_t
    angles = triangulation.triangulation_angles(centers, X, inlier_f)

    # Exit codes (priority order mirrors the reference's checks).
    n_meas = jnp.sum(mask, axis=-1)
    all_behind = jnp.sum((depth > 0) & (mask > 0), axis=-1) < 2
    code = jnp.full((T,), TriangulationExitCode.SUCCESS, jnp.int32)
    code = jnp.where(angles < min_tri_angle_deg, TriangulationExitCode.INSUFFICIENT_ANGLE, code)
    code = jnp.where(n_inl < 2, TriangulationExitCode.EXCEEDS_REPROJ_THRESHOLD, code)
    code = jnp.where(all_behind, TriangulationExitCode.CHEIRALITY_FAILURE, code)
    code = jnp.where(n_meas < 2, TriangulationExitCode.INSUFFICIENT_MEASUREMENTS, code)

    return TriangulationResult(
        points=X, inlier_mask=inlier_f, exit_codes=code, best_num_inliers=best_count
    )


def exit_code_histogram(codes: np.ndarray) -> dict[str, int]:
    """Per-code counts for metrics (reference data_assoc exit-code metrics)."""
    codes = np.asarray(codes)
    return {
        c.name.lower(): int(np.sum(codes == c.value)) for c in TriangulationExitCode
    }
