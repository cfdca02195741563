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


def test_torch_converter_layout(tmp_path, rng):
    """Synthetic checkpoint in the official PatchmatchNet layout: converter
    must fold BNs, embed 1x1 Conv3d heads, and the loaded model must run."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    sd = {}

    def convw(prefix, o, i, k, bias=True, dims=2):
        shape = (o, i) + (k,) * dims
        sd[f"{prefix}.weight"] = torch.randn(*shape) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    def cbr(prefix, o, i, k):
        convw(f"{prefix}.conv", o, i, k, bias=False)
        bn(f"{prefix}.bn", o)

    # FeatureNet (net.py:15): channels/kernels as upstream.
    specs = [(8, 3, 3), (8, 8, 3), (16, 8, 5), (16, 16, 3), (16, 16, 3),
             (32, 16, 5), (32, 32, 3), (32, 32, 3), (64, 32, 5), (64, 64, 3),
             (64, 64, 3)]
    for idx, (o, i, k) in enumerate(specs):
        cbr(f"feature.conv{idx}", o, i, k)
    convw("feature.output1", 64, 64, 1, bias=False)
    convw("feature.inner1", 64, 32, 1)
    convw("feature.inner2", 64, 16, 1)
    convw("feature.output2", 32, 64, 1, bias=False)
    convw("feature.output3", 16, 64, 1, bias=False)

    # PatchMatch stages: Conv3d 1x1x1 heads + propa_conv (stages 1, 2).
    for i, G, feat, pn in ((1, 4, 16, 16), (2, 8, 32, 8), (3, 8, 64, 0)):
        base = f"patchmatch_{i}"
        for net_name in ("pixel_wise_net", "similarity_net"):
            cbr_pfx = f"{base}.evaluation.{net_name}"
            convw(f"{cbr_pfx}.conv0.conv", 16, G, 1, bias=False, dims=3)
            bn(f"{cbr_pfx}.conv0.bn", 16)
            convw(f"{cbr_pfx}.conv1.conv", 8, 16, 1, bias=False, dims=3)
            bn(f"{cbr_pfx}.conv1.bn", 8)
            last = "conv2" if net_name == "pixel_wise_net" else "similarity"
            convw(f"{cbr_pfx}.{last}", 1, 8, 1, dims=3)
        if pn:
            convw(f"{base}.propa_conv", 2 * pn, feat, 3)
    # Refinement (upsample_net).
    cbr("upsample_net.conv0", 8, 3, 3)
    cbr("upsample_net.conv1", 8, 1, 3)
    cbr("upsample_net.conv2", 8, 8, 3)
    convw("upsample_net.deconv", 8, 8, 3, bias=False)  # unused by the port
    bn("upsample_net.bn", 8)
    cbr("upsample_net.conv3", 8, 16, 3)
    convw("upsample_net.res", 1, 8, 3, bias=False)

    path = str(tmp_path / "patchmatchnet_fake.ckpt")
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, path)

    params = pmn.convert_torch_checkpoint(path)
    # 1x1 Conv3d heads embedded as center taps where our head is 3x3.
    k = np.asarray(params["patchmatch_1"]["similarity"]["similarity"]["kernel"])
    assert k.shape[:2] == (3, 3)
    assert np.abs(k[0, 0]).max() == 0 and np.abs(k[1, 1]).max() > 0

    # The converted params must drive the real model.
    net = pmn.PatchmatchNet()
    H = W = 64
    ref = jnp.asarray(np.random.default_rng(0).random((H, W, 3)), jnp.float32)
    srcs = jnp.asarray(np.random.default_rng(1).random((2, H, W, 3)), jnp.float32)
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    sRr = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    str_ = jnp.asarray([[0.2, 0, 0], [-0.2, 0, 0]])
    depth, conf = net.apply(
        {"params": params}, ref, srcs, K, jnp.tile(K[None], (2, 1, 1)),
        sRr, str_, 1.0, 10.0,
    )
    assert depth.shape == (H, W)
    assert np.all(np.isfinite(np.asarray(depth)))
