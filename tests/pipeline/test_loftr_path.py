"""Image-correspondence (LoFTR) pipeline path: runs end-to-end mechanics with
random weights on a tiny synthetic dataset (matches are meaningless without
pretrained weights — this validates the plumbing: aggregation, verification,
graceful failure)."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

from gtsfm_tpu.loader.olsson import OlssonLoader
from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer


@pytest.fixture()
def tiny_dataset(tmp_path, rng):
    os.makedirs(tmp_path / "images")
    for i in range(4):
        PILImage.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / "images" / f"img_{i:02d}.jpg")
    return str(tmp_path)


def test_loftr_correspondence_path(tiny_dataset):
    loader = OlssonLoader(tiny_dataset, max_resolution=64, image_extension="jpg")
    cfg = PipelineConfig(enable_cache=False)
    cfg.frontend.feature_type = "loftr"
    cfg.frontend.allow_random_weights = True
    cfg.frontend.max_keypoints = 64
    opt = SceneOptimizer(cfg)
    pairs = opt.generate_pairs(loader)
    feats, cals, sizes, pre = opt.run_image_correspondences(loader, pairs)
    assert len(feats) == 4
    x1, x2, cm, idx = pre
    assert x1.shape[0] == len(pairs)
    # Keypoint tables consistent with match indices.
    for f in feats:
        assert f.uv.shape[0] == feats[0].uv.shape[0]

    # Full verification path executes (success will be False w/ random kpts).
    res, match_idx = opt.run_two_view(feats, cals, pairs, precomputed=pre)
    assert res.i2Ri1.shape[0] == len(pairs)


def test_loftr_requires_weights_flag(tiny_dataset):
    loader = OlssonLoader(tiny_dataset, max_resolution=64, image_extension="jpg")
    cfg = PipelineConfig(enable_cache=False)
    cfg.frontend.feature_type = "loftr"
    cfg.frontend.allow_random_weights = False
    opt = SceneOptimizer(cfg)
    with pytest.raises(ValueError, match="loftr requires"):
        opt.run_image_correspondences(loader, opt.generate_pairs(loader))
