"""PatchmatchNet (Flax) tests: architecture-complete, random init — checks
shapes, differentiable warping, the upstream grid-sampling quirk, the
deformable positions/weights machinery, the ConvTranspose lowering, and the
official-checkpoint converter (accuracy tests belong to the plane-sweep
engine; pretrained weights are not shipped in this zero-egress environment)."""

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


def test_sample_border_matches_torch_grid_sample(rng):
    """_sample_border must reproduce the upstream propagation/evaluation
    sampling bit for bit: grid built with align_corners=True normalization,
    F.grid_sample called with its default align_corners=False + border."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    H, W, C = 13, 17, 3
    img = rng.random((H, W, C)).astype(np.float32)
    # Arbitrary fractional positions incl. out-of-range ones.
    px = rng.uniform(-2, W + 1, size=(50,)).astype(np.float32)
    py = rng.uniform(-2, H + 1, size=(50,)).astype(np.float32)

    ours = np.asarray(
        pmn._sample_border(jnp.asarray(img), jnp.asarray(px), jnp.asarray(py))
    )

    gx = torch.from_numpy(px) / ((W - 1) / 2) - 1
    gy = torch.from_numpy(py) / ((H - 1) / 2) - 1
    grid = torch.stack([gx, gy], -1).view(1, 1, -1, 2)
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = (
        F.grid_sample(t_img, grid, mode="bilinear", padding_mode="border")
        .view(C, -1).T.numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_deform_positions_zero_offsets():
    """Zero learned offsets give the fixed dilated grid positions."""
    H, W = 6, 7
    base = pmn._prop_base_offsets(8, dilation=2)
    pos = pmn._deform_positions(base, jnp.zeros((H, W, 16)), H, W)
    assert pos.shape == (8, H, W, 2)
    # Neighbor 0 is (dy, dx) = (-2, -2): position = (x - 2, y - 2).
    np.testing.assert_allclose(np.asarray(pos[0, 3, 4]), [4 - 2, 3 - 2])
    # Eval offsets include the center at index 4 with dilation-1.
    ebase = pmn._eval_base_offsets(9, dilation=2)
    assert ebase[4] == (0, 0)
    assert ebase[0] == (-1, -1)


def test_deform_positions_learned_channel_order():
    """Learned offset channel 2k is X, 2k+1 is Y (upstream convention)."""
    H, W = 5, 5
    learned = jnp.zeros((H, W, 2)).at[..., 0].set(1.5).at[..., 1].set(-0.5)
    pos = pmn._deform_positions([(0, 0)], learned, H, W)
    np.testing.assert_allclose(np.asarray(pos[0, 2, 2]), [2 + 1.5, 2 - 0.5])


def test_depth_weight_identical_depths_uniform(rng):
    """All samples at the same depth -> every neighbor gets the max weight
    sigmoid(4) (differences are zero)."""
    H, W = 8, 8
    samples = jnp.full((4, H, W), 5.0)
    pos = pmn._deform_positions(
        pmn._eval_base_offsets(9, 2), jnp.zeros((H, W, 18)), H, W
    )
    w = pmn._depth_weight(samples, 1.0 / 10.0, 1.0 / 2.0, pos, 0.025)
    assert w.shape == (4, 9, H, W)
    np.testing.assert_allclose(np.asarray(w), 1.0 / (1.0 + np.exp(-4.0)), atol=1e-5)


def test_transpose_conv_matches_torch(rng):
    """The Refinement deconv lowering (lhs-dilated conv with flipped kernel)
    must equal torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    H, W, Ci, Co = 9, 11, 4, 5
    x = rng.random((H, W, Ci)).astype(np.float32)
    w = (rng.random((Ci, Co, 3, 3)).astype(np.float32) - 0.5) * 0.2

    ref = F.conv_transpose2d(
        torch.from_numpy(x).permute(2, 0, 1)[None], torch.from_numpy(w),
        stride=2, padding=1, output_padding=1,
    )[0].permute(1, 2, 0).numpy()

    k = np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(0, 1)).copy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(k), window_strides=(1, 1),
        padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    assert ours.shape == (2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


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
    # Zero-init offset convs -> propa/eval grids start at the fixed grids.
    assert np.abs(np.asarray(params["patchmatch_3"]["propa_conv"]["kernel"])).max() == 0
    assert np.abs(np.asarray(params["patchmatch_2"]["eval_conv"]["kernel"])).max() == 0
    assert "propa_conv" not in params["patchmatch_1"]  # upstream: propagate 0
    assert "pixelwise" in params["patchmatch_3"]
    assert "pixelwise" not in params["patchmatch_2"]
    depth, conf = net.apply(
        {"params": params}, ref, srcs, K, Ks, sRr, str_,
        jnp.asarray(2.0), jnp.asarray(10.0),
    )
    assert depth.shape == (H, W)
    assert conf.shape == (H, W)
    d = np.asarray(depth)
    assert np.all(np.isfinite(d))
    assert np.all(np.isfinite(np.asarray(conf)))


def test_torch_converter_layout(tmp_path, rng):
    """Synthetic checkpoint in the official PatchmatchNet layout: converter
    must fold BNs (incl. the deconv's), map the 1x1x1 Conv3d heads, the
    per-stage eval/propa offset convs and feature-weight nets, and the loaded
    params must drive the real model."""
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

    # PatchMatch stages (upstream: propagate (0, 8, 16), features (16, 32, 64),
    # pixel_wise_net only on stage 3; eval_conv + feature_weight_net on all).
    def head3(prefix, G, last):
        convw(f"{prefix}.conv0.conv", 16, G, 1, bias=False, dims=3)
        bn(f"{prefix}.conv0.bn", 16)
        convw(f"{prefix}.conv1.conv", 8, 16, 1, bias=False, dims=3)
        bn(f"{prefix}.conv1.bn", 8)
        convw(f"{prefix}.{last}", 1, 8, 1, dims=3)

    for i, G, feat, pn in ((1, 4, 16, 0), (2, 8, 32, 8), (3, 8, 64, 16)):
        base = f"patchmatch_{i}"
        head3(f"{base}.evaluation.similarity_net", G, "similarity")
        head3(f"{base}.feature_weight_net", G, "similarity")
        if i == 3:
            head3(f"{base}.evaluation.pixel_wise_net", G, "conv2")
        convw(f"{base}.eval_conv", 2 * 9, feat, 3)
        if pn:
            convw(f"{base}.propa_conv", 2 * pn, feat, 3)

    # Refinement (upsample_net) incl. deconv + its BatchNorm.
    cbr("upsample_net.conv0", 8, 3, 3)
    cbr("upsample_net.conv1", 8, 1, 3)
    cbr("upsample_net.conv2", 8, 8, 3)
    sd["upsample_net.deconv.weight"] = torch.randn(8, 8, 3, 3) * 0.05  # (I, O, kh, kw)
    bn("upsample_net.bn", 8)
    cbr("upsample_net.conv3", 8, 16, 3)
    convw("upsample_net.res", 1, 8, 3, bias=False)

    path = str(tmp_path / "patchmatchnet_fake.ckpt")
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, path)

    params = pmn.convert_torch_checkpoint(path)
    # 1x1 Conv3d heads stay 1x1 (upstream SimilarityNet is all-1x1).
    k = np.asarray(params["patchmatch_1"]["similarity"]["similarity"]["kernel"])
    assert k.shape[:2] == (1, 1)
    assert "propa_conv" not in params["patchmatch_1"]
    assert params["patchmatch_3"]["propa_conv"]["kernel"].shape == (3, 3, 64, 32)
    assert params["patchmatch_2"]["eval_conv"]["kernel"].shape == (3, 3, 32, 18)
    assert "pixelwise" in params["patchmatch_3"]
    assert params["refinement"]["deconv"]["kernel"].shape == (3, 3, 8, 8)

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
        sRr, str_, jnp.asarray(2.0), jnp.asarray(8.0),
    )
    assert depth.shape == (H, W)
    assert np.all(np.isfinite(np.asarray(depth)))
    assert np.all(np.isfinite(np.asarray(conf)))


def test_densify_patchmatchnet_pipeline_driver(rng):
    """Pipeline-level engine call (reference mvs_patchmatchnet.py:55): random
    weights (depths are meaningless) — validates the full driver mechanics:
    view selection, per-view inference, fusion, DensifyResult contract."""
    from tests.densify.test_plane_sweep import make_plane_scene

    images, sc, _ = make_plane_scene(rng, n_cams=3, H=48, W=64)
    result = pmn.densify_patchmatchnet(
        images, sc, allow_random_weights=True, num_src_views=2
    )
    assert result.points.ndim == 2 and result.points.shape[1] == 3
    assert result.rgb.shape[0] == result.points.shape[0]
    assert "num_dense_points" in result.metrics


def test_densify_patchmatchnet_requires_weights(rng):
    from tests.densify.test_plane_sweep import make_plane_scene

    images, sc, _ = make_plane_scene(rng, n_cams=3, H=48, W=64)
    with pytest.raises(ValueError, match="patchmatchnet"):
        pmn.densify_patchmatchnet(images, sc, allow_random_weights=False)


def test_densify_config_engine_switch():
    from gtsfm_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.densify.engine == "plane_sweep"
    cfg.apply_overrides(["densify.engine=patchmatchnet",
                         "densify.allow_random_weights=true"])
    assert cfg.densify.engine == "patchmatchnet"
    assert cfg.densify.allow_random_weights is True
