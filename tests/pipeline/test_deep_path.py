"""End-to-end deep det/desc -> matcher pipeline path (VERDICT r2 item 4).

Drives SceneOptimizer with feature_type=superpoint and
matcher_type=superglue|lightglue on converted SYNTHETIC torch checkpoints
(the golden_utils builders — no pretrained weights exist in this
environment, so match quality is meaningless; what this locks is the
PLUMBING the reference exercises with its deep config
(tests/test_gtsfm_runner_olssonloader.py:20-39 + configs/deep_front_end.yaml):
checkpoint loading + conversion, batched _deep_match dispatch
(scene_optimizer.py), report-stage tags, verification input shapes, and
graceful degradation of the full run when no pair verifies."""

import os
import sys

import numpy as np
import pytest
from PIL import Image as PILImage

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "frontend"))
import golden_utils  # noqa: E402

from gtsfm_tpu.loader.olsson import OlssonLoader  # noqa: E402
from gtsfm_tpu.pipeline.config import PipelineConfig  # noqa: E402
from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer  # noqa: E402


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """4 images of seeded smooth noise (64x64, /8-divisible for SuperPoint)."""
    root = tmp_path_factory.mktemp("deep_scene")
    rng = np.random.default_rng(7)
    os.makedirs(root / "images")
    for i in range(4):
        PILImage.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(root / "images" / f"img_{i:02d}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    torch = pytest.importorskip("torch")  # noqa: F841
    d = tmp_path_factory.mktemp("ckpts")
    sp, sg, lg = (str(d / f"{n}.pth") for n in ("sp", "sg", "lg"))
    golden_utils.build_superpoint(sp)
    golden_utils.build_superglue(sg)
    golden_utils.build_lightglue(lg)
    return {"superpoint": sp, "superglue": sg, "lightglue": lg}


def _base_config(checkpoints) -> PipelineConfig:
    cfg = PipelineConfig(enable_cache=False, compile_cache=False)
    cfg.frontend.feature_type = "superpoint"
    cfg.frontend.superpoint_checkpoint = checkpoints["superpoint"]
    cfg.frontend.max_keypoints = 64
    return cfg


def test_superpoint_superglue_two_view(tiny_dataset, checkpoints):
    """compute_features -> _deep_match (SuperGlue) -> full verification,
    with per-stage report tags (PRE_BA / POST_BA / POST_ISP)."""
    loader = OlssonLoader(tiny_dataset, max_resolution=64, image_extension="jpg")
    cfg = _base_config(checkpoints)
    cfg.frontend.matcher_type = "superglue"
    cfg.frontend.superglue_checkpoint = checkpoints["superglue"]
    opt = SceneOptimizer(cfg)

    pairs = opt.generate_pairs(loader)
    assert len(pairs) > 0
    feats, cals, sizes = opt.compute_features(loader)
    assert len(feats) == 4
    k = feats[0].uv.shape[0]
    for f in feats:  # uniform padding across images (batched matcher input)
        assert f.uv.shape == (k, 2)
        assert f.descriptor.shape[0] == k

    res, match_idx, stages = opt.run_two_view(feats, cals, pairs,
                                              return_stages=True)
    P = len(pairs)
    assert res.i2Ri1.shape == (P, 3, 3)
    assert res.i2Ui1.shape == (P, 3)
    assert match_idx is not None and match_idx.shape[0] == P
    # The reference serializes reports at PRE_BA/POST_BA/POST_ISP
    # (two_view_estimator.py:38-41); same tags here.
    assert {"PRE_BA", "POST_BA", "POST_ISP"} <= set(stages)
    for st in stages.values():
        assert st.i2Ri1.shape == (P, 3, 3)


def test_superpoint_lightglue_adaptive_full_run(tiny_dataset, checkpoints,
                                                tmp_path):
    """Full SceneOptimizer.run() with the LightGlue adaptive-depth/width
    path enabled under jit; random-weight matches won't verify, so this
    also locks graceful degradation (no exception, empty-or-small scene)."""
    loader = OlssonLoader(tiny_dataset, max_resolution=64, image_extension="jpg")
    cfg = _base_config(checkpoints)
    cfg.frontend.matcher_type = "lightglue"
    cfg.frontend.lightglue_checkpoint = checkpoints["lightglue"]
    # Adaptive early-exit + bucket compaction (the LightGlue paper's
    # depth/width pruning; host-synced confidence thresholds).
    cfg.frontend.lightglue_depth_confidence = 0.95
    cfg.frontend.lightglue_width_confidence = 0.99
    cfg.output_root = str(tmp_path / "out")
    opt = SceneOptimizer(cfg)

    result = opt.run(loader, save_outputs=True)
    assert result.scene is not None
    assert isinstance(result.metrics, list) and len(result.metrics) > 0
    names = {g.name for g in result.metrics}
    assert any("two_view" in n or "verifier" in n or "frontend" in n
               for n in names), names


def test_missing_checkpoint_refused(tiny_dataset):
    """Without a checkpoint and without allow_random_weights the deep path
    must refuse (reference ships pretrained weights; silently random weights
    would produce garbage reconstructions)."""
    loader = OlssonLoader(tiny_dataset, max_resolution=64, image_extension="jpg")
    cfg = PipelineConfig(enable_cache=False, compile_cache=False)
    cfg.frontend.feature_type = "superpoint"
    cfg.frontend.allow_random_weights = False
    opt = SceneOptimizer(cfg)
    with pytest.raises(ValueError, match="superpoint requires"):
        opt.compute_features(loader)
