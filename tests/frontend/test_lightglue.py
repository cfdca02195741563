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
