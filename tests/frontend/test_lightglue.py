import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend.deep import lightglue


@pytest.fixture(scope="module")
def lg():
    return lightglue.LightGlue().init_random(k=24)


def test_lightglue_runs(lg, rng):
    k = 24
    desc = rng.standard_normal((2, k, 256)).astype(np.float32)
    kpts = rng.uniform(0, 64, size=(2, k, 2)).astype(np.float32)
    mask0 = np.ones((1, k), np.float32)
    mask0[0, 16:] = 0
    idx, mm = lg(
        jnp.asarray(desc[:1]), jnp.asarray(desc[1:]),
        jnp.asarray(kpts[:1]), jnp.asarray(kpts[1:]),
        jnp.asarray(mask0), jnp.ones((1, k)),
        (64, 64), (64, 64),
    )
    assert idx.shape == (1, 24)
    assert np.all(np.asarray(mm[0])[16:] == 0)


def test_assignment_identity(rng):
    """Diagonal-dominant similarity + high matchability -> identity match."""
    K = 10
    sim = jnp.asarray(np.eye(K, dtype=np.float32) * 20.0)[None]
    z = jnp.full((1, K), 10.0)  # sigmoid ~ 1
    mask = jnp.ones((1, K))
    logP = lightglue.assignment_scores(sim, z, z, mask, mask)
    best = np.asarray(jnp.argmax(logP[0], axis=1))
    np.testing.assert_array_equal(best, np.arange(K))
    assert float(jnp.exp(logP[0, 0, 0])) > 0.9


def test_rotary_is_relative(rng):
    """Attention logits q.k under rotary depend only on relative position."""
    freqs = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    pos_a = jnp.asarray([[[1.0, 2.0], [4.0, 6.0]]])
    shift = jnp.asarray([10.0, -3.0])
    pos_b = pos_a + shift
    x = jnp.asarray(rng.standard_normal((1, 2, 1, 32)), jnp.float32)
    ca, sa = lightglue.rotary_embed(pos_a, freqs)
    cb, sb = lightglue.rotary_embed(pos_b, freqs)
    qa = lightglue.apply_rotary(x, ca, sa)
    qb = lightglue.apply_rotary(x, cb, sb)
    dot_a = float(jnp.sum(qa[0, 0] * qa[0, 1]))
    dot_b = float(jnp.sum(qb[0, 0] * qb[0, 1]))
    assert dot_a == pytest.approx(dot_b, abs=1e-3)


def test_adaptive_depth_early_exit(rng):
    """Confidence heads force an exit after layer 1; the adaptive path must
    record the shallow depth and still emit well-formed matches."""
    K = 16
    lg = lightglue.LightGlue(depth_confidence=0.95).init_random(k=K)
    # Bias every exit head to "confident" (sigmoid(10) ~ 1 > all thresholds).
    import flax

    p = flax.core.unfreeze(lg.params) if hasattr(flax.core, "unfreeze") else dict(lg.params)
    for i in range(lightglue.NUM_LAYERS - 1):
        p[f"token_conf{i}"]["bias"] = jnp.full_like(p[f"token_conf{i}"]["bias"], 10.0)
    lg.params = p

    desc = jnp.asarray(rng.standard_normal((2, K, lightglue.D_MODEL)), jnp.float32)
    kpts = jnp.asarray(rng.uniform(0, 100, size=(2, K, 2)), jnp.float32)
    mask = jnp.ones((1, K))
    idx, mm = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask, (100, 100), (100, 100))
    assert lg.last_depth == 1
    assert idx.shape == (1, K) and mm.shape == (1, K)

    # With unconfident heads the adaptive path runs all layers and must agree
    # with the static full-depth program exactly.
    for i in range(lightglue.NUM_LAYERS - 1):
        p[f"token_conf{i}"]["bias"] = jnp.full_like(p[f"token_conf{i}"]["bias"], -10.0)
    lg.params = p
    idx_a, mm_a = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask, (100, 100), (100, 100))
    assert lg.last_depth == lightglue.NUM_LAYERS
    lg.depth_confidence = None
    idx_f, mm_f = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask, (100, 100), (100, 100))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_f))
    np.testing.assert_array_equal(np.asarray(mm_a), np.asarray(mm_f))


def test_adaptive_width_prunes_unmatchable(rng):
    """All tokens confident + unmatchable -> pruned down to the 128-bucket;
    no matches survive (upstream point pruning semantics)."""
    K = 256
    lg = lightglue.LightGlue(
        width_confidence=0.99, width_min_keypoints=128
    ).init_random(k=K)
    p = dict(lg.params)
    for i in range(lightglue.NUM_LAYERS - 1):
        p[f"token_conf{i}"]["bias"] = jnp.full_like(p[f"token_conf{i}"]["bias"], 10.0)
        p[f"matchability{i}"]["kernel"] = jnp.zeros_like(p[f"matchability{i}"]["kernel"])
        p[f"matchability{i}"]["bias"] = jnp.full_like(p[f"matchability{i}"]["bias"], -10.0)
    lg.params = p
    desc = jnp.asarray(rng.standard_normal((2, K, lightglue.D_MODEL)), jnp.float32)
    kpts = jnp.asarray(rng.uniform(0, 100, size=(2, K, 2)), jnp.float32)
    mask = jnp.ones((1, K))
    idx, mm = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask,
                 (100, 100), (100, 100))
    assert lg.last_widths == (128, 128)
    assert idx.shape == (1, K) and mm.shape == (1, K)
    assert np.asarray(mm).sum() == 0  # pruned points cannot match


def test_adaptive_width_keep_all_matches_full(rng):
    """Nothing prunable (all tokens matchable): the width-adaptive path must
    agree with the static full-depth program exactly."""
    K = 256
    lg = lightglue.LightGlue(
        width_confidence=0.99, width_min_keypoints=128
    ).init_random(k=K)
    p = dict(lg.params)
    for i in range(lightglue.NUM_LAYERS - 1):
        p[f"matchability{i}"]["bias"] = jnp.full_like(p[f"matchability{i}"]["bias"], 10.0)
    lg.params = p
    desc = jnp.asarray(rng.standard_normal((2, K, lightglue.D_MODEL)), jnp.float32)
    kpts = jnp.asarray(rng.uniform(0, 100, size=(2, K, 2)), jnp.float32)
    mask = jnp.ones((1, K))
    idx_a, mm_a = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask,
                     (100, 100), (100, 100))
    assert lg.last_widths == (K, K)
    lg.width_confidence = None
    idx_f, mm_f = lg(desc[0:1], desc[1:2], kpts[0:1], kpts[1:2], mask, mask,
                     (100, 100), (100, 100))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_f))
    np.testing.assert_array_equal(np.asarray(mm_a), np.asarray(mm_f))


def test_confidence_threshold_decreasing():
    ths = [lightglue.confidence_threshold(i) for i in range(lightglue.NUM_LAYERS)]
    assert all(a >= b for a, b in zip(ths, ths[1:]))
    assert 0.8 <= ths[-1] <= ths[0] <= 0.9 + 1e-9
