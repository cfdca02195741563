"""End-to-end NetVLAD retrieval path (VERDICT r3 item 5).

Mirrors tests/pipeline/test_deep_path.py for retrieval: a tiny scene and a
CONVERTED synthetic matconvnet NetVLAD checkpoint drive
image -> NetVLAD inference -> blocked similarity matrix -> top-K ->
(joint) pair list through SceneOptimizer.generate_pairs — the path the
reference exercises with ImagePairsGenerator + NetVLADRetriever /
JointNetVLADSequentialRetriever (gtsfm/retriever/netvlad_retriever.py:33-107,
joint_netvlad_sequential_retriever.py:18). No pretrained weights exist in
this environment, so descriptor QUALITY is meaningless; what the test locks
is that identical images retrieve each other (cosine similarity 1) through
the full converted-checkpoint inference path, and the regime plumbing."""

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
def netvlad_ckpt(tmp_path_factory):
    pytest.importorskip("scipy")
    d = tmp_path_factory.mktemp("nv_ckpt")
    path = str(d / "netvlad_fake.mat")
    golden_utils.build_netvlad(path)
    return path


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """5 images: 0 and 3 are IDENTICAL; the rest are unrelated noise."""
    root = tmp_path_factory.mktemp("retrieval_scene")
    rng = np.random.default_rng(3)
    os.makedirs(root / "images")
    imgs = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(4)]
    imgs.insert(3, imgs[0].copy())  # index 3 duplicates index 0
    for i, im in enumerate(imgs):
        PILImage.fromarray(im).save(root / "images" / f"img_{i:02d}.jpg")
    return str(root)


def _config(ckpt, regime) -> PipelineConfig:
    cfg = PipelineConfig(enable_cache=False, compile_cache=False)
    cfg.retriever.regime = regime
    cfg.retriever.netvlad_checkpoint = ckpt
    cfg.retriever.num_matched = 1
    cfg.retriever.min_score = 0.9
    cfg.retriever.max_frame_lookahead = 1
    return cfg


def test_retrieval_regime_finds_duplicate(scene_dir, netvlad_ckpt):
    loader = OlssonLoader(scene_dir, max_resolution=64)
    opt = SceneOptimizer(_config(netvlad_ckpt, "retrieval"))
    pairs = opt.generate_pairs(loader)
    # Identical images -> identical descriptors -> similarity 1.0 >= 0.9;
    # unrelated noise images land well below the 0.9 gate for top-1.
    assert (0, 3) in pairs
    for a, b in pairs:
        assert 0 <= a < b < len(loader)


def test_joint_regime_unions_window(scene_dir, netvlad_ckpt):
    loader = OlssonLoader(scene_dir, max_resolution=64)
    opt = SceneOptimizer(_config(netvlad_ckpt, "sequential_with_retrieval"))
    pairs = opt.generate_pairs(loader)
    # Sequential window (lookahead 1) is always present...
    for i in range(len(loader) - 1):
        assert (i, i + 1) in pairs
    # ...plus the retrieval hit on the duplicate pair.
    assert (0, 3) in pairs
