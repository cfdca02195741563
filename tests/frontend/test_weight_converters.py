"""Weight-converter tests with SYNTHETIC torch checkpoints in the exact
upstream layouts (no pretrained weights exist in this zero-egress
environment; these tests prove the converters handle the real formats and
that BN folding is numerically exact)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_superpoint_converter(tmp_path, rng):
    from gtsfm_tpu.frontend.deep import superpoint as sp_mod

    sd = {}
    chans = {
        "conv1a": (64, 1), "conv1b": (64, 64), "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128), "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convPb": (65, 256), "convDa": (256, 128), "convDb": (256, 256),
    }
    for name, (o, i) in chans.items():
        k = 1 if name in ("convPb", "convDb") else 3
        sd[f"{name}.weight"] = torch.randn(o, i, k, k) * 0.05
        sd[f"{name}.bias"] = torch.randn(o) * 0.01
    path = str(tmp_path / "superpoint_v1.pth")
    torch.save(sd, path)

    params = sp_mod.convert_torch_checkpoint(path)
    sp = sp_mod.SuperPoint(params=params, max_keypoints=64)
    feats = sp(jnp.asarray(rng.random((64, 64)), jnp.float32))
    assert feats.uv.shape == (64, 2)

    # Cross-check one conv against torch directly.
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), sd["conv1a.weight"].float(), sd["conv1a.bias"].float(),
            padding=1,
        ).numpy()
    w = np.asarray(params["conv1a"]["kernel"])
    b = np.asarray(params["conv1a"]["bias"])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


def test_superglue_converter_bn_folding(tmp_path, rng):
    """Build the upstream SuperGlue state-dict layout; verify the converter
    runs and that eval-mode BatchNorm folding is EXACT on the keypoint
    encoder MLP."""
    from gtsfm_tpu.frontend.deep import superglue as sg_mod

    sd = {}

    def conv1d(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, 1) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    # kenc: Conv1d(3,32) BN ReLU Conv1d(32,64) BN ReLU Conv1d(64,128) BN ReLU Conv1d(128,256)
    dims = [3, 32, 64, 128, 256]
    for li, ci in enumerate([0, 3, 6, 9]):
        conv1d(f"kenc.encoder.{ci}", dims[li + 1], dims[li])
        if li < 3:
            bn(f"kenc.encoder.{ci + 1}", dims[li + 1])
    for g in range(9):
        for k in range(2):
            base = f"gnn.layers.{2 * g + k}"
            for p in range(3):
                conv1d(f"{base}.attn.proj.{p}", 256, 256)
            conv1d(f"{base}.attn.merge", 256, 256)
            conv1d(f"{base}.mlp.0", 512, 512)
            bn(f"{base}.mlp.1", 512)
            conv1d(f"{base}.mlp.3", 256, 512)
    conv1d("final_proj", 256, 256)
    sd["bin_score"] = torch.tensor(2.3268)
    path = str(tmp_path / "superglue_fake.pth")
    torch.save(sd, path)

    params, bin_score = sg_mod.convert_torch_checkpoint(path)
    assert bin_score == pytest.approx(2.3268, abs=1e-4)

    # BN-folding exactness: torch conv+eval-BN vs folded dense on random input.
    x = torch.randn(1, 3, 10)
    with torch.no_grad():
        y = torch.nn.functional.conv1d(x, sd["kenc.encoder.0.weight"], sd["kenc.encoder.0.bias"])
        bn_t = torch.nn.BatchNorm1d(32).eval()
        bn_t.weight.data = sd["kenc.encoder.1.weight"]
        bn_t.bias.data = sd["kenc.encoder.1.bias"]
        bn_t.running_mean.data = sd["kenc.encoder.1.running_mean"]
        bn_t.running_var.data = sd["kenc.encoder.1.running_var"]
        ref = bn_t(y).numpy()  # (1, 32, 10)
    k = np.asarray(params["kenc"]["dense0"]["kernel"])  # (3, 32)
    b = np.asarray(params["kenc"]["dense0"]["bias"])
    ours = x.numpy()[0].T @ k + b  # (10, 32)
    np.testing.assert_allclose(ours.T[None], ref, atol=1e-4)

    # Full model runs with converted params.
    sg = sg_mod.SuperGlue(params=params, bin_score=bin_score)
    K = 16
    d = jnp.asarray(np.random.default_rng(0).standard_normal((2, K, 256)), jnp.float32)
    kp = jnp.zeros((2, K, 2))
    sc = jnp.ones((2, K))
    idx, mm = sg(d[:1], d[1:], kp[:1], kp[1:], sc[:1] * 0.5, sc[1:] * 0.5,
                 jnp.ones((1, K)), jnp.ones((1, K)), (100, 100), (100, 100))
    assert idx.shape == (1, K)


def test_lightglue_converter_layout(tmp_path):
    from gtsfm_tpu.frontend.deep import lightglue as lg_mod

    sd = {}

    def lin(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    lin("input_proj", 256, 256)
    sd["posenc.Wr.weight"] = torch.randn(32, 2) * 0.1
    for i in range(9):
        base = f"transformers.{i}"
        lin(f"{base}.self_attn.Wqkv", 768, 256)
        lin(f"{base}.self_attn.out_proj", 256, 256)
        lin(f"{base}.self_attn.ffn.0", 512, 512)
        lin(f"{base}.self_attn.ffn.1", 512, 512)  # LayerNorm w/b
        sd[f"{base}.self_attn.ffn.1.weight"] = torch.rand(512)
        sd[f"{base}.self_attn.ffn.1.bias"] = torch.randn(512) * 0.1
        lin(f"{base}.self_attn.ffn.3", 256, 512)
        lin(f"{base}.cross_attn.to_qk", 256, 256)
        lin(f"{base}.cross_attn.to_v", 256, 256)
        lin(f"{base}.cross_attn.out_proj", 256, 256)
        lin(f"{base}.cross_attn.ffn.0", 512, 512)
        sd[f"{base}.cross_attn.ffn.1.weight"] = torch.rand(512)
        sd[f"{base}.cross_attn.ffn.1.bias"] = torch.randn(512) * 0.1
        lin(f"{base}.cross_attn.ffn.3", 256, 512)
    for i in range(9):
        lin(f"log_assignment.{i}.final_proj", 256, 256)
        lin(f"log_assignment.{i}.matchability", 1, 256)
    for i in range(8):
        lin(f"token_confidence.{i}.token.0", 1, 256)
    path = str(tmp_path / "lightglue_fake.pth")
    torch.save(sd, path)

    params = lg_mod.convert_torch_checkpoint(path)
    # Per-layer assignment heads mapped from log_assignment.{i}.
    np.testing.assert_allclose(
        np.asarray(params["matchability0"]["kernel"])[:, 0],
        sd["log_assignment.0.matchability.weight"].numpy()[0],
        atol=1e-6,
    )
    lg = lg_mod.LightGlue(params=params)
    K = 16
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((2, K, 256)), jnp.float32)
    kp = jnp.asarray(rng.uniform(0, 64, (2, K, 2)), jnp.float32)
    idx, mm = lg(d[:1], d[1:], kp[:1], kp[1:],
                 jnp.ones((1, K)), jnp.ones((1, K)), (64, 64), (64, 64))
    assert idx.shape == (1, K)


def test_loftr_converter_layout(tmp_path, rng):
    """Synthetic checkpoint in the official LoFTR (lightning) layout: the
    converter must fold BNs, map every layer, and the loaded model must run."""
    from gtsfm_tpu.frontend.deep import loftr as lf_mod

    sd = {}

    def convw(prefix, o, i, k, bias=False):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k, k) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    def lin(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    convw("backbone.conv1", 128, 1, 7); bn("backbone.bn1", 128)
    dims = {1: (128, 128), 2: (196, 128), 3: (256, 196)}
    for li, (d, d_in) in dims.items():
        for bi in (0, 1):
            i_ch = d_in if bi == 0 else d
            convw(f"backbone.layer{li}.{bi}.conv1", d, i_ch, 3)
            bn(f"backbone.layer{li}.{bi}.bn1", d)
            convw(f"backbone.layer{li}.{bi}.conv2", d, d, 3)
            bn(f"backbone.layer{li}.{bi}.bn2", d)
            if bi == 0 and li > 1:
                convw(f"backbone.layer{li}.{bi}.downsample.0", d, i_ch, 1)
                bn(f"backbone.layer{li}.{bi}.downsample.1", d)
    convw("backbone.layer3_outconv", 256, 256, 1)
    convw("backbone.layer2_outconv", 256, 196, 1)
    convw("backbone.layer2_outconv2.0", 256, 256, 3)
    bn("backbone.layer2_outconv2.1", 256)
    convw("backbone.layer2_outconv2.3", 196, 256, 3)
    convw("backbone.layer1_outconv", 196, 128, 1)
    convw("backbone.layer1_outconv2.0", 196, 196, 3)
    bn("backbone.layer1_outconv2.1", 196)
    convw("backbone.layer1_outconv2.3", 128, 196, 3)

    def enc(prefix, d):
        lin(f"{prefix}.q_proj", d, d, bias=False)
        lin(f"{prefix}.k_proj", d, d, bias=False)
        lin(f"{prefix}.v_proj", d, d, bias=False)
        lin(f"{prefix}.merge", d, d, bias=False)
        lin(f"{prefix}.mlp.0", 2 * d, 2 * d, bias=False)
        lin(f"{prefix}.mlp.2", d, 2 * d, bias=False)
        sd[f"{prefix}.norm1.weight"] = torch.rand(d)
        sd[f"{prefix}.norm1.bias"] = torch.randn(d) * 0.1
        sd[f"{prefix}.norm2.weight"] = torch.rand(d)
        sd[f"{prefix}.norm2.bias"] = torch.randn(d) * 0.1

    for i in range(8):
        enc(f"loftr_coarse.layers.{i}", 256)
    for i in range(2):
        enc(f"loftr_fine.layers.{i}", 128)
    lin("fine_preprocess.down_proj", 128, 256)
    lin("fine_preprocess.merge_feat", 128, 256)

    # Lightning wrapping: 'matcher.' prefix + state_dict envelope.
    path = str(tmp_path / "outdoor_ds_fake.ckpt")
    torch.save({"state_dict": {f"matcher.{k}": v for k, v in sd.items()}}, path)

    params = lf_mod.convert_torch_checkpoint(path)
    model = lf_mod.LoFTR(params=params, max_matches=64)
    out = model(
        jnp.asarray(np.random.default_rng(0).random((64, 64)), jnp.float32),
        jnp.asarray(np.random.default_rng(1).random((64, 64)), jnp.float32),
    )
    assert out.kpts0.shape == (64, 2)

    # BN folding numerics: stem conv+bn vs folded flax conv.
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), sd["backbone.conv1.weight"].float(),
            None, stride=2, padding=3,
        )
        ref = torch.nn.functional.batch_norm(
            ref, sd["backbone.bn1.running_mean"].float(),
            sd["backbone.bn1.running_var"].float(),
            sd["backbone.bn1.weight"].float(), sd["backbone.bn1.bias"].float(),
            training=False, eps=1e-5,
        ).numpy()
    w = np.asarray(params["backbone"]["conv1"]["kernel"])
    b = np.asarray(params["backbone"]["conv1"]["bias"])
    out_j = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w), (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), ref, atol=1e-3
    )
