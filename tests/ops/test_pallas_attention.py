"""Flash-attention kernel vs the einsum reference (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.ops.pallas_kernels import attention


def make_qkv(rng, BH=2, K=256, Dh=64):
    q = jnp.asarray(rng.standard_normal((BH, K, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, K, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, K, Dh)), jnp.float32)
    return q, k, v


def test_flash_matches_reference(rng):
    q, k, v = make_qkv(rng)
    mask = jnp.ones((2, 256))
    out_ref = attention.reference_attention(q, k, v, mask)
    out_flash = attention.flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref), atol=2e-5)


def test_flash_respects_mask(rng):
    q, k, v = make_qkv(rng)
    mask = jnp.ones((2, 256)).at[:, 200:].set(0.0)
    out_ref = attention.reference_attention(q, k, v, mask)
    out_flash = attention.flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref), atol=2e-5)
    # Changing masked k/v must not change the output.
    k2 = k.at[:, 200:].set(99.0)
    v2 = v.at[:, 200:].set(-99.0)
    out2 = attention.flash_attention(q, k2, v2, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out2), atol=1e-6)


def test_dispatch_fallback(rng):
    """On CPU the dispatcher must take the einsum path and agree."""
    q, k, v = make_qkv(rng, BH=1, K=128)
    mask = jnp.ones((1, 128))
    out = attention.masked_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(attention.reference_attention(q, k, v, mask)), atol=1e-6
    )
