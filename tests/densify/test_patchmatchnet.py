"""PatchmatchNet (Flax) tests: architecture-complete, random init, verified
on the synthetic textured-plane scene (depth must still be recoverable by the
coarse random-init + regression machinery? No — random weights give arbitrary
scores, so these tests check shapes, masking, and differentiable warping
correctness; accuracy tests belong to the plane-sweep engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.densify import patchmatchnet as pmn


def test_feature_net_shapes(rng):
    net = pmn.FeatureNet()
    x = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out["stage_3"].shape == (1, 8, 12, 64)
    assert out["stage_2"].shape == (1, 16, 24, 32)
    assert out["stage_1"].shape == (1, 32, 48, 16)


def test_warp_identity():
    """Warping with identity pose and matching K must return the src feature
    at the same pixel (for the true depth)."""
    H, W, C = 16, 24, 4
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    depths = jnp.full((1, H, W), 5.0)
    out = pmn.warp_src_feature(feat, K, K, jnp.eye(3), jnp.zeros(3), depths)
    # Interior exact; the clip-to-(W-1.001) guard leaves ~1e-3 at borders.
    np.testing.assert_allclose(
        np.asarray(out[0, :-1, :-1]), np.asarray(feat[:-1, :-1]), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(feat), atol=2e-3)


def test_warp_translation_shifts():
    """A pure x-translation with known depth shifts sampling by f*t/z px."""
    H, W, C = 16, 24, 2
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    f = 20.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    t = jnp.asarray([1.0, 0.0, 0.0])  # src_t_ref
    z = 5.0
    depths = jnp.full((1, H, W), z)
    out = pmn.warp_src_feature(feat, K, K, jnp.eye(3), t, depths)
    shift = f * 1.0 / z  # = 4 px
    # out[y, x] == feat[y, x + shift]
    np.testing.assert_allclose(
        np.asarray(out[0, :-1, : W - 5]), np.asarray(feat[:-1, 4 : W - 1]), atol=2e-3
    )


def test_propagation_hypotheses():
    d = jnp.arange(12.0).reshape(3, 4)
    hyp = pmn.propagation_hypotheses(d, dilation=1, num_neighbors=8)
    assert hyp.shape == (8, 3, 4)
    # neighbor (0, 1): rolled by +1 column
    np.testing.assert_allclose(np.asarray(hyp[4][0, 1]), float(d[0, 0]))


def test_full_model_runs(rng):
    net = pmn.PatchmatchNet()
    H, W, S = 64, 96, 3
    ref = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    srcs = jnp.asarray(rng.random((S, H, W, 3)), jnp.float32)
    K = jnp.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    Ks = jnp.tile(K[None], (S, 1, 1))
    sRr = jnp.tile(jnp.eye(3)[None], (S, 1, 1))
    str_ = jnp.asarray(rng.normal(size=(S, 3)) * 0.1, jnp.float32)
    params = net.init(
        jax.random.PRNGKey(0), ref, srcs, K, Ks, sRr, str_,
        jnp.asarray(2.0), jnp.asarray(10.0),
    )["params"]
    depth, conf = net.apply(
        {"params": params}, ref, srcs, K, Ks, sRr, str_,
        jnp.asarray(2.0), jnp.asarray(10.0),
    )
    assert depth.shape == (H, W)
    assert conf.shape == (H, W)
    d = np.asarray(depth)
    assert np.all(np.isfinite(d))
    assert d.min() >= 2.0 - 1e-3 and d.max() <= 10.0 + 1e-3


def test_deformable_gather_zero_offsets_matches_fixed_grid(rng):
    """Zero learned offsets must reproduce the fixed dilated grid exactly
    (interior pixels; borders differ: roll wraps, gather clamps)."""
    import jax.numpy as jnp

    from gtsfm_tpu.densify import patchmatchnet as pm

    depth = jnp.asarray(rng.random((20, 24)), jnp.float32)
    off = jnp.zeros((20, 24, 16))
    fixed = pm.propagation_hypotheses(depth, dilation=2, num_neighbors=8)
    deform = pm.deformable_gather(depth, off, dilation=2, num_neighbors=8)
    np.testing.assert_allclose(
        np.asarray(deform)[:, 4:-4, 4:-4], np.asarray(fixed)[:, 4:-4, 4:-4],
        atol=1e-6,
    )


def test_deformable_gather_offsets_shift_samples(rng):
    """A +1.0 learned x-offset shifts the gathered hypothesis by one pixel."""
    import jax.numpy as jnp

    from gtsfm_tpu.densify import patchmatchnet as pm

    depth = jnp.asarray(rng.random((16, 16)), jnp.float32)
    off = jnp.zeros((16, 16, 2)).at[..., 1].set(1.0)  # (dy=0, dx=+1) for n=1
    out = pm.deformable_gather(depth, off, dilation=1, num_neighbors=1)
    # neighbor 0 of the 8-grid is (-1, -1); with dx offset +1 the effective
    # grid offset becomes (-1, 0) -> roll semantics give roll(depth, (-1, 0)).
    expected = np.roll(np.asarray(depth), (-1, 0), axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(out[0])[2:-2, 2:-2], expected[2:-2, 2:-2], atol=1e-5
    )
