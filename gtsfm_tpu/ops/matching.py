"""Batched descriptor matching: mutual nearest-neighbor + Lowe ratio test.

TPU-native replacement for cv2.BFMatcher mutual-NN matching (reference
gtsfm/frontend/matcher/twoway_matcher.py:24). The reference matches one pair
per Dask task; here the (B pairs, K kpts, D dim) descriptor blocks hit the MXU
as one batched similarity matmul, with masked argmax both ways.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e9


@functools.partial(jax.jit, static_argnames=("ratio_test",))
def mutual_nearest_matching(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio_test: float | None = 0.8,
    distance_threshold: float | None = None,
):
    """Mutual-NN matching over batched descriptor sets.

    Args:
      desc1: (B, K1, D) L2-normalized descriptors (cosine similarity ==
        monotone in L2 distance for unit vectors, matching the reference's
        NORM_L2 on rootSIFT / normalized deep descriptors).
      desc2: (B, K2, D).
      mask1/mask2: (B, K) validity.
      ratio_test: Lowe ratio on L2 distances (None disables).
      distance_threshold: optional max L2 distance.

    Returns:
      match_idx: (B, K1) int32 — for each kpt in image1 the matched kpt index
        in image2, or -1.
      match_mask: (B, K1) float — 1.0 where a mutual match survived the tests.
    """
    sim = jnp.einsum("bkd,bld->bkl", desc1, desc2)  # cosine similarity
    sim = jnp.where(mask1[:, :, None] > 0, sim, NEG)
    sim = jnp.where(mask2[:, None, :] > 0, sim, NEG)

    best12 = jnp.argmax(sim, axis=2)  # (B, K1)
    best21 = jnp.argmax(sim, axis=1)  # (B, K2)
    k1_ids = jnp.arange(sim.shape[1])[None, :]
    mutual = jnp.take_along_axis(best21, best12, axis=1) == k1_ids

    s_best = jnp.max(sim, axis=2)
    ok = mutual & (mask1 > 0) & (s_best > NEG / 2)

    # L2 distance for unit descriptors: d^2 = 2 - 2 s.
    d_best_sq = jnp.maximum(2.0 - 2.0 * s_best, 0.0)
    if ratio_test is not None:
        # second-best similarity (mask out the best)
        sim2 = jnp.where(
            jax.nn.one_hot(best12, sim.shape[2], dtype=bool), NEG, sim
        )
        s_second = jnp.max(sim2, axis=2)
        d_second_sq = jnp.maximum(2.0 - 2.0 * s_second, 0.0)
        ok = ok & (d_best_sq < (ratio_test**2) * d_second_sq)
    if distance_threshold is not None:
        ok = ok & (d_best_sq < distance_threshold**2)

    match_idx = jnp.where(ok, best12, -1).astype(jnp.int32)
    return match_idx, ok.astype(desc1.dtype)


@functools.partial(jax.jit, static_argnames=("ratio_test",))
def match_hamming(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio_test: float | None = 0.8,
    distance_threshold: float | None = None,
):
    """Mutual-NN Hamming matching for binary descriptors (ORB/BRISK).

    TPU-native replacement for cv2.BFMatcher(NORM_HAMMING): descriptors are
    float {0,1} arrays of D bits; with b = 2d-1 (+/-1 coding) the Hamming
    distance is (D - b1.b2)/2 — one MXU matmul for all pairs.

    Returns (match_idx (B, K1) int32, match_mask (B, K1) float) like
    mutual_nearest_matching. distance_threshold is in BITS.
    """
    D = desc1.shape[-1]
    b1 = 2.0 * desc1 - 1.0
    b2 = 2.0 * desc2 - 1.0
    sim = jnp.einsum("bkd,bld->bkl", b1, b2)  # = D - 2 * hamming
    sim = jnp.where(mask1[:, :, None] > 0, sim, NEG)
    sim = jnp.where(mask2[:, None, :] > 0, sim, NEG)

    best12 = jnp.argmax(sim, axis=2)
    best21 = jnp.argmax(sim, axis=1)
    k1_ids = jnp.arange(sim.shape[1])[None, :]
    mutual = jnp.take_along_axis(best21, best12, axis=1) == k1_ids

    s_best = jnp.max(sim, axis=2)
    ok = mutual & (mask1 > 0) & (s_best > NEG / 2)
    h_best = 0.5 * (D - s_best)
    if ratio_test is not None:
        sim2 = jnp.where(jax.nn.one_hot(best12, sim.shape[2], dtype=bool), NEG, sim)
        h_second = 0.5 * (D - jnp.max(sim2, axis=2))
        ok = ok & (h_best < ratio_test * h_second)
    if distance_threshold is not None:
        ok = ok & (h_best < distance_threshold)
    match_idx = jnp.where(ok, best12, -1).astype(jnp.int32)
    return match_idx, ok.astype(desc1.dtype)


def matches_to_correspondences(
    match_idx: jnp.ndarray,
    match_mask: jnp.ndarray,
    kpts1: jnp.ndarray,
    kpts2: jnp.ndarray,
):
    """Gather matched coordinate pairs, keeping the fixed K1 shape.

    Returns (x1 (B, K1, 2), x2 (B, K1, 2), mask (B, K1)); rows where
    match_mask == 0 are zeros.
    """
    idx = jnp.maximum(match_idx, 0)
    x2 = jnp.take_along_axis(kpts2, idx[..., None], axis=1)
    m = match_mask[..., None]
    return kpts1 * m, x2 * m, match_mask
