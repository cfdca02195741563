"""Similarity-based retrieval over global descriptors.

TPU-native replacement for the reference's NetVLADRetriever
(gtsfm/retriever/netvlad_retriever.py:33): cosine-similarity matrix of global
descriptors computed in blocks (:77, 50x50 blocks under a 16 GB budget;
here one MXU matmul per block row, block 1024), top-K neighbors per query
above min_score, plus the joint sequential+retrieval union
(joint_netvlad_sequential_retriever.py:18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_NUM_IMAGES = 10000  # reference netvlad_retriever.py:21


def similarity_matrix(descriptors: jnp.ndarray, block: int = 1024) -> np.ndarray:
    """(N, D) L2-normalized -> dense (N, N) cosine similarity, blockwise."""
    n = descriptors.shape[0]
    if n > MAX_NUM_IMAGES:
        raise ValueError(f"too many images ({n} > {MAX_NUM_IMAGES})")
    out = np.zeros((n, n), np.float32)
    mm = jax.jit(lambda a, b: a @ b.T)
    for s in range(0, n, block):
        out[s : s + block] = np.asarray(mm(descriptors[s : s + block], descriptors))
    return out


def retrieve_pairs(
    sim: np.ndarray, num_matched: int = 5, min_score: float = 0.1
) -> list[tuple[int, int]]:
    """Top-K neighbors per query above min_score (netvlad_retriever.py:54)."""
    n = sim.shape[0]
    pairs = set()
    s = sim.copy()
    np.fill_diagonal(s, -np.inf)
    for i in range(n):
        nbrs = np.argsort(-s[i])[:num_matched]
        for j in nbrs:
            if s[i, j] >= min_score:
                a, b = (i, int(j)) if i < j else (int(j), i)
                if a != b:
                    pairs.add((a, b))
    return sorted(pairs)


def joint_sequential_retrieval_pairs(
    sim: np.ndarray,
    max_frame_lookahead: int,
    num_matched: int = 5,
    min_score: float = 0.1,
) -> list[tuple[int, int]]:
    """Union of the sliding window and retrieval pair sets
    (joint_netvlad_sequential_retriever.py:18)."""
    n = sim.shape[0]
    pairs = set(retrieve_pairs(sim, num_matched, min_score))
    for a in range(n):
        for b in range(a + 1, min(a + 1 + max_frame_lookahead, n)):
            pairs.add((a, b))
    return sorted(pairs)
