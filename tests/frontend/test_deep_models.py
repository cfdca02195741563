"""Deep front-end tests: architecture-complete Flax models, random init
(pretrained checkpoints are not distributable in this environment; weight
converters are exercised separately when checkpoints exist)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend.deep import netvlad, superglue, superpoint


@pytest.fixture(scope="module")
def sp():
    return superpoint.SuperPoint(max_keypoints=256).init_random()


def test_superpoint_shapes_and_masks(sp, rng):
    img = jnp.asarray(rng.random((128, 160)), jnp.float32)
    feats = sp(img)
    assert feats.uv.shape == (256, 2)
    assert feats.descriptor.shape == (256, 256)
    live = np.asarray(feats.mask) > 0
    if live.any():
        uv = np.asarray(feats.uv)[live]
        assert uv[:, 0].max() < 160 and uv[:, 1].max() < 128
        d = np.asarray(feats.descriptor)[live]
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_superpoint_deterministic(sp, rng):
    img = jnp.asarray(rng.random((128, 160)), jnp.float32)
    f1, f2 = sp(img), sp(img)
    np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))


def test_superpoint_nms():
    s = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(1.0).at[0, 10, 12].set(0.5)
    out = superpoint.simple_nms(s, radius=4)
    assert float(out[0, 10, 10]) == 1.0
    assert float(out[0, 10, 12]) == 0.0  # suppressed by stronger neighbor


def test_superpoint_cell_shuffle():
    """scores_from_logits must place cell channel k at pixel (8i + k//8, 8j + k%8)."""
    logits = jnp.full((1, 2, 2, 65), -10.0)
    logits = logits.at[0, 1, 0, 9].set(10.0)  # cell (1,0), channel 9 -> (y=8+1, x=0+1)
    s = superpoint.scores_from_logits(logits)
    assert s.shape == (1, 16, 16)
    iy, ix = np.unravel_index(np.argmax(np.asarray(s[0])), (16, 16))
    assert (iy, ix) == (9, 1)


@pytest.fixture(scope="module")
def sg():
    return superglue.SuperGlue().init_random(k=32)


def _fake_pair(rng, k=32, d=256):
    desc = rng.standard_normal((2, k, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    kpts = rng.uniform(0, 100, size=(2, k, 2)).astype(np.float32)
    sc = rng.random((2, k)).astype(np.float32)
    return desc, kpts, sc


def test_superglue_runs_and_masks(sg, rng):
    desc, kpts, sc = _fake_pair(rng)
    mask0 = np.ones((1, 32), np.float32)
    mask0[0, 20:] = 0
    mask1 = np.ones((1, 32), np.float32)
    idx, mm = sg(
        jnp.asarray(desc[:1]), jnp.asarray(desc[1:]),
        jnp.asarray(kpts[:1]), jnp.asarray(kpts[1:]),
        jnp.asarray(sc[:1]), jnp.asarray(sc[1:]),
        jnp.asarray(mask0), jnp.asarray(mask1),
        (100, 100), (100, 100),
    )
    assert idx.shape == (1, 32)
    # Masked query keypoints never match.
    assert np.all(np.asarray(mm[0])[20:] == 0)


def test_sinkhorn_doubly_stochastic(rng):
    """Rows/cols of exp(P) (excluding dustbin) must satisfy the marginals."""
    B, K0, K1 = 1, 8, 10
    scores = jnp.asarray(rng.standard_normal((B, K0, K1)), jnp.float32)
    mask0 = jnp.ones((B, K0))
    mask1 = jnp.ones((B, K1))
    log_P = superglue.log_sinkhorn(scores, mask0, mask1, bin_score=0.5, iters=200)
    P = np.exp(np.asarray(log_P[0]))
    # Each live row (non-dustbin) sums to ~1.
    np.testing.assert_allclose(P[:K0].sum(-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :K1].sum(0)[:K1], 1.0, atol=1e-3)
    # Dustbin row absorbs K0 mass-equivalents... (column dustbin sums to K0 - matched)
    assert P.sum() == pytest.approx(K0 + K1, abs=0.1)


def test_sinkhorn_identity_matching():
    """Strong diagonal scores must produce the identity matching."""
    K = 12
    scores = jnp.asarray(np.eye(K, dtype=np.float32) * 10.0)[None]
    mask = jnp.ones((1, K))
    log_P = superglue.log_sinkhorn(scores, mask, mask, bin_score=0.0)
    idx, mm = superglue.extract_matches(log_P, mask, mask, match_threshold=0.2)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.arange(K))
    assert float(mm.sum()) == K


def test_netvlad_descriptor(rng):
    nv = netvlad.NetVLAD().init_random(h=64, w=64)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    d = nv(imgs)
    assert d.shape == (2, 4096)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)
    # Same image -> same descriptor; different -> different.
    d2 = nv(imgs)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))
    assert not np.allclose(np.asarray(d[0]), np.asarray(d[1]))


def test_retrieval_pairs(rng):
    from gtsfm_tpu.retriever import similarity

    d = rng.standard_normal((6, 32)).astype(np.float32)
    d[1] = d[0] + 0.01 * rng.standard_normal(32)  # 0 and 1 similar
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sim = similarity.similarity_matrix(jnp.asarray(d))
    assert sim.shape == (6, 6)
    pairs = similarity.retrieve_pairs(sim, num_matched=1, min_score=0.5)
    assert (0, 1) in pairs
    joint = similarity.joint_sequential_retrieval_pairs(sim, max_frame_lookahead=1)
    assert (2, 3) in joint  # sequential part
