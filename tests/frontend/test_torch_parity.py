"""Full-network numerical parity vs an independent torch forward.

The golden fixtures lock regressions; these tests go further and prove the
Flax models compute the SAME function as the torch architecture the
checkpoints come from (reference model:
thirdparty/SuperGluePretrainedNetwork/models/superpoint.py — the torch
forward here is re-written from the published architecture, conv/pool/head
structure only)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.frontend.golden_utils import build_superpoint


def _torch_superpoint_forward(sd, x):
    """Independent torch forward of the SuperPoint architecture:
    VGG-style shared encoder (3x3 convs + ReLU, 2x2 maxpool after pairs),
    65-ch detector head, 256-d descriptor head (L2-normalized)."""
    import torch.nn.functional as F

    def conv(name, y, k=3):
        return F.conv2d(y, sd[f"{name}.weight"], sd[f"{name}.bias"],
                        padding=k // 2)

    y = F.relu(conv("conv1a", x))
    y = F.relu(conv("conv1b", y))
    y = F.max_pool2d(y, 2, 2)
    y = F.relu(conv("conv2a", y))
    y = F.relu(conv("conv2b", y))
    y = F.max_pool2d(y, 2, 2)
    y = F.relu(conv("conv3a", y))
    y = F.relu(conv("conv3b", y))
    y = F.max_pool2d(y, 2, 2)
    y = F.relu(conv("conv4a", y))
    y = F.relu(conv("conv4b", y))
    det = F.relu(conv("convPa", y))
    det = conv("convPb", det, k=1)
    desc = F.relu(conv("convDa", y))
    desc = conv("convDb", desc, k=1)
    desc = desc / desc.norm(dim=1, keepdim=True).clamp(min=1e-12)
    return det, desc


def test_superpoint_full_network_matches_torch(tmp_path, rng):
    from gtsfm_tpu.frontend.deep import superpoint as sp_mod

    ckpt = str(tmp_path / "superpoint_v1.pth")
    build_superpoint(ckpt)
    sd = torch.load(ckpt)
    params = sp_mod.convert_torch_checkpoint(ckpt)

    img = rng.random((48, 64)).astype(np.float32)
    with torch.no_grad():
        det_t, desc_t = _torch_superpoint_forward(
            sd, torch.from_numpy(img)[None, None]
        )
    det_j, desc_j = sp_mod.SuperPointNet().apply(
        {"params": params}, jnp.asarray(img)[None, ..., None]
    )
    np.testing.assert_allclose(
        np.asarray(det_j)[0].transpose(2, 0, 1), det_t[0].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(desc_j)[0].transpose(2, 0, 1), desc_t[0].numpy(), atol=1e-4
    )

    # Post-processing parity: cell softmax + un-shuffle == torch reference
    # pipeline (softmax over 65, drop dustbin, pixel-shuffle by 8).
    probs_t = torch.nn.functional.softmax(det_t, 1)[:, :-1]
    B, _, Hc, Wc = probs_t.shape
    heat_t = (
        probs_t.permute(0, 2, 3, 1).reshape(B, Hc, Wc, 8, 8)
        .permute(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    )
    heat_j = sp_mod.scores_from_logits(det_j)
    np.testing.assert_allclose(np.asarray(heat_j), heat_t.numpy(), atol=1e-5)
