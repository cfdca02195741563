import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.ops import matching


def unit(rng, n, d=32):
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_mutual_nn_exact_permutation(rng):
    d1 = unit(rng, 20)
    perm = rng.permutation(20)
    d2 = d1[perm]
    idx, mask = matching.mutual_nearest_matching(
        jnp.asarray(d1)[None], jnp.asarray(d2)[None],
        jnp.ones((1, 20)), jnp.ones((1, 20)), ratio_test=None,
    )
    idx = np.asarray(idx[0])
    assert np.asarray(mask[0]).sum() == 20
    inv = np.argsort(perm)
    np.testing.assert_array_equal(idx, inv)


def test_ratio_test_kills_ambiguous(rng):
    base = unit(rng, 1)[0]
    # Two nearly identical descriptors in image 2 -> ambiguous match.
    d1 = np.stack([base])
    d2 = np.stack([base + 1e-3 * unit(rng, 1)[0], base + 1.1e-3 * unit(rng, 1)[0]])
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    idx, mask = matching.mutual_nearest_matching(
        jnp.asarray(d1)[None], jnp.asarray(d2)[None],
        jnp.ones((1, 1)), jnp.ones((1, 2)), ratio_test=0.8,
    )
    assert float(mask[0, 0]) == 0.0
    # Without ratio test it matches.
    _, mask2 = matching.mutual_nearest_matching(
        jnp.asarray(d1)[None], jnp.asarray(d2)[None],
        jnp.ones((1, 1)), jnp.ones((1, 2)), ratio_test=None,
    )
    assert float(mask2[0, 0]) == 1.0


def test_masked_keypoints_never_match(rng):
    d1 = unit(rng, 10)
    d2 = d1.copy()
    m1 = np.ones(10); m1[7:] = 0
    m2 = np.ones(10); m2[:2] = 0
    idx, mask = matching.mutual_nearest_matching(
        jnp.asarray(d1)[None], jnp.asarray(d2)[None],
        jnp.asarray(m1)[None], jnp.asarray(m2)[None], ratio_test=None,
    )
    mask = np.asarray(mask[0]); idx = np.asarray(idx[0])
    assert np.all(mask[7:] == 0)  # masked query kpts
    matched_targets = idx[mask > 0]
    assert np.all(matched_targets >= 2)  # masked target kpts never selected


def test_matches_to_correspondences(rng):
    k1 = jnp.asarray(rng.normal(size=(1, 5, 2)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(1, 6, 2)), jnp.float32)
    idx = jnp.asarray([[2, -1, 0, 5, -1]], jnp.int32)
    m = jnp.asarray([[1.0, 0, 1, 1, 0]])
    x1, x2, mask = matching.matches_to_correspondences(idx, m, k1, k2)
    np.testing.assert_allclose(np.asarray(x2[0, 0]), np.asarray(k2[0, 2]))
    np.testing.assert_allclose(np.asarray(x2[0, 3]), np.asarray(k2[0, 5]))
    np.testing.assert_allclose(np.asarray(x1[0, 1]), 0.0)
