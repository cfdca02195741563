"""KAZE tests (nonlinear scale space + M-SURF descriptor)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend import kaze
from gtsfm_tpu.ops import matching
from tests.frontend.test_sift import make_texture

SMALL = dict(max_keypoints=256, num_octaves=3, k_per_level=128)


@pytest.fixture(scope="module")
def texture():
    return make_texture(np.random.default_rng(7), n=160)


def test_fed_steps_cover_time():
    for T in (0.5, 3.0, 20.0):
        taus = kaze._fed_tau_steps(T)
        assert abs(sum(taus) - T) < 1e-6
        assert all(t > 0 for t in taus)


def test_diffusion_preserves_mean(rng):
    """Explicit diffusion with periodic stencils conserves total intensity."""
    L = jnp.asarray(rng.random((32, 32)), jnp.float32)
    g = jnp.ones_like(L) * 0.5
    L2 = kaze._diffusion_step(L, g, 0.2)
    np.testing.assert_allclose(float(L2.mean()), float(L.mean()), atol=1e-6)
    # Smoothing: variance must not increase.
    assert float(L2.var()) <= float(L.var()) + 1e-9


def test_detects_keypoints(texture):
    f = kaze.detect_and_describe(jnp.asarray(texture), **SMALL)
    n = float(f.mask.sum())
    assert n > 30
    live = np.asarray(f.mask) > 0
    d = np.asarray(f.descriptor)[live]
    assert d.shape[1] == 64
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_translation_matching(texture):
    shift = 12
    img2 = np.roll(texture, (shift, 0), axis=(0, 1))
    f1 = kaze.detect_and_describe(jnp.asarray(texture), **SMALL)
    f2 = kaze.detect_and_describe(jnp.asarray(img2), **SMALL)
    idx, mm = matching.mutual_nearest_matching(
        f1.descriptor[None], f2.descriptor[None], f1.mask[None], f2.mask[None],
        ratio_test=0.9,
    )
    x1, x2, cm = matching.matches_to_correspondences(idx, mm, f1.uv[None], f2.uv[None])
    assert float(cm.sum()) > 15
    dv = np.asarray(x2 - x1)[0][np.asarray(cm[0]) > 0]
    med = np.median(dv, axis=0)
    np.testing.assert_allclose(med, [0.0, shift], atol=1.5)


def test_determinism(texture):
    f1 = kaze.detect_and_describe(jnp.asarray(texture), **SMALL)
    f2 = kaze.detect_and_describe(jnp.asarray(texture), **SMALL)
    np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))
    np.testing.assert_array_equal(np.asarray(f1.descriptor), np.asarray(f2.descriptor))
