import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend.deep import loftr


def test_linear_attention_matches_softmax_limit(rng):
    """Linear attention is its own op; sanity: output is a convex-ish mix of
    values (bounded by value range) and respects the kv mask."""
    B, N, H, D = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    mask = jnp.ones((B, N)).at[0, 10:].set(0.0)
    out = loftr.linear_attention(q, k, v, mask)
    assert out.shape == (B, N, H, D)
    # Masked kv: zeroing masked v must not change output.
    v2 = v.at[0, 10:].set(99.0)
    out2 = loftr.linear_attention(q, k, v2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_positional_encoding_shape():
    pe = loftr.positional_encoding_2d(8, 12, 256)
    assert pe.shape == (8, 12, 256)
    assert float(jnp.abs(pe).max()) <= 1.0 + 1e-6


@pytest.fixture(scope="module")
def model():
    return loftr.LoFTR(max_matches=128).init_random(h=64, w=64)


def test_loftr_runs(model, rng):
    img0 = jnp.asarray(rng.random((64, 64)), jnp.float32)
    img1 = jnp.asarray(rng.random((64, 64)), jnp.float32)
    out = model(img0, img1)
    assert out.kpts0.shape == (128, 2)
    assert out.kpts1.shape == (128, 2)
    live = np.asarray(out.mask) > 0
    if live.any():
        k0 = np.asarray(out.kpts0)[live]
        assert k0[:, 0].max() < 64 and k0[:, 1].max() < 64


def test_loftr_identity_pair(model, rng):
    """Same image twice: surviving matches should be (near-)identity."""
    img = jnp.asarray(rng.random((64, 64)), jnp.float32)
    out = model(img, img)
    live = np.asarray(out.mask) > 0
    if live.sum() > 0:
        d = np.linalg.norm(
            np.asarray(out.kpts0)[live] - np.asarray(out.kpts1)[live], axis=-1
        )
        assert np.median(d) < 8.0  # within one coarse cell
