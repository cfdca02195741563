"""Batched RANSAC verifier tests — synthetic scenes with outliers
(mirrors reference tests/frontend/verifier strategy, no mocks)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.ops import ransac
from tests.geometry.test_epipolar import make_two_view_scene


def corrupt(rng, x1, x2, outlier_frac):
    n = x1.shape[0]
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    x2 = np.asarray(x2).copy()
    x2[idx] += rng.uniform(0.05, 0.3, size=(n_out, 2)) * rng.choice([-1, 1], size=(n_out, 2))
    return jnp.asarray(x2), idx


def test_ransac_rejects_outliers(rng):
    x1, x2, R_gt, t_gt = make_two_view_scene(rng, n_pts=200, noise=3e-4)
    x2c, out_idx = corrupt(rng, x1, x2, 0.3)
    key = jax.random.PRNGKey(0)
    res = ransac.verify_essential_batched(
        key,
        x1[None],
        x2c[None],
        jnp.ones((1, 200)),
        threshold=4.0 / 1000.0,  # ~4px at f=1000
        num_hypotheses=512,
    )
    assert bool(res.success[0])
    # Rotation within 1 deg, direction within 2 deg.
    assert float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R_gt))) < 1.0
    ang = np.degrees(np.arccos(np.clip(float(jnp.dot(res.i2Ui1[0], t_gt)), -1, 1)))
    assert ang < 2.0
    # Most outliers excluded from the inlier mask.
    inl = np.asarray(res.inlier_mask[0])
    assert inl[out_idx].mean() < 0.2
    assert inl.sum() >= 120


def test_ransac_batched_pairs(rng):
    scenes = [make_two_view_scene(rng, n_pts=100, noise=3e-4) for _ in range(3)]
    x1 = jnp.stack([s[0] for s in scenes])
    x2 = jnp.stack([s[1] for s in scenes])
    res = ransac.verify_essential_batched(
        jax.random.PRNGKey(1), x1, x2, jnp.ones((3, 100)), threshold=4e-3, num_hypotheses=128
    )
    for p in range(3):
        assert bool(res.success[p])
        assert float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[p], scenes[p][2]))) < 1.5


def test_ransac_padding_inert(rng):
    """Padded correspondences (mask=0) must not change the result."""
    x1, x2, R_gt, _ = make_two_view_scene(rng, n_pts=80, noise=3e-4)
    pad = 40
    x1p = jnp.concatenate([x1, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    x2p = jnp.concatenate([x2, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    mask = jnp.concatenate([jnp.ones(80), jnp.zeros(pad)])
    res = ransac.verify_essential_batched(
        jax.random.PRNGKey(2), x1p[None], x2p[None], mask[None], threshold=4e-3, num_hypotheses=256
    )
    assert bool(res.success[0])
    assert float(jnp.sum(res.inlier_mask[0, 80:])) == 0.0
    assert float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R_gt))) < 1.0


def test_ransac_insufficient_support(rng):
    """Pure-noise correspondences must fail the support gates."""
    x1 = jnp.asarray(rng.normal(size=(1, 60, 2)) * 0.3, jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(1, 60, 2)) * 0.3, jnp.float32)
    res = ransac.verify_essential_batched(
        jax.random.PRNGKey(3), x1, x2, jnp.ones((1, 60)), threshold=1e-3, num_hypotheses=128
    )
    assert not bool(res.success[0])
