"""Pair-generation regime tests (reference retriever_base.py)."""

import numpy as np




def test_sequential_hilti_pairs():
    """Rig sliding-window regime (reference SEQUENTIAL_HILTI,
    retriever_base.py:23): FOV-overlapping camera combinations within a rig
    and across up to max_rig_lookahead stations."""
    from gtsfm_tpu.retriever import sequential_hilti_pairs
    from gtsfm_tpu.retriever.basic import (
        INTRA_RIG_VALID_PAIRS, INTER_RIG_VALID_PAIRS,
    )

    n_rigs, num_cams = 4, 5
    pairs = sequential_hilti_pairs(n_rigs * num_cams, max_rig_lookahead=2)
    assert pairs == sorted(set(pairs))  # sorted, deduped, a < b
    for a, b in pairs:
        r1, c1 = divmod(a, num_cams)
        r2, c2 = divmod(b, num_cams)
        assert 0 <= r2 - r1 <= 2
        if r1 == r2:
            assert (c1, c2) in INTRA_RIG_VALID_PAIRS or (c2, c1) in INTRA_RIG_VALID_PAIRS
        else:
            assert (c1, c2) in INTER_RIG_VALID_PAIRS or (c2, c1) in INTER_RIG_VALID_PAIRS
    # Every intra combo appears for every rig; inter combos for each window.
    n_intra = n_rigs * len(INTRA_RIG_VALID_PAIRS)
    assert len(pairs) >= n_intra
    # Much sparser than the dense rig window it replaces.
    dense = [(i, j) for i in range(20) for j in range(i + 1, 20)
             if abs(i // 5 - j // 5) <= 2]
    assert len(pairs) < len(dense) / 2
    # Truncated final rig: indices stay in range.
    pairs_trunc = sequential_hilti_pairs(17, max_rig_lookahead=2)
    assert all(0 <= a < 17 and 0 <= b < 17 for a, b in pairs_trunc)


def test_retrieval_10k_envelope(rng):
    """The reference caps retrieval at 10,000 images and documents a
    50x50-block / 16 GB similarity design (netvlad_retriever.py:21,34).
    The device top-K path must handle exactly that envelope within a far
    smaller budget and agree with the dense similarity_matrix path.
    (Small descriptor dim keeps CPU FLOPs testable; the (N, N) similarity
    shape — the memory driver — is the real 10k.)"""
    import resource

    import jax.numpy as jnp

    from gtsfm_tpu.retriever import similarity

    n, dim = 10000, 64
    d = rng.normal(size=(n, dim)).astype("float32")
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    descs = jnp.asarray(d)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    pairs_tk = similarity.retrieve_pairs_topk(descs, num_matched=3,
                                              min_score=-1.0)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert rss1 - rss0 < 4.0  # GB — reference budget is 16
    assert len(pairs_tk) >= n * 3 // 2  # top-3 per query, deduped

    sim = similarity.similarity_matrix(descs)
    pairs_dense = similarity.retrieve_pairs(sim, num_matched=3,
                                            min_score=-1.0)
    assert pairs_tk == pairs_dense

    # The envelope cap itself (reference MAX_NUM_IMAGES).
    import pytest

    with pytest.raises(ValueError):
        similarity.retrieve_pairs_topk(jnp.zeros((10001, 4)), 3)
