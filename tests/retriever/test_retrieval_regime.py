"""Pipeline wiring of the retrieval regimes (reference ImagePairsGenerator +
NetVLADRetriever / JointNetVLADSequentialRetriever)."""

import numpy as np
import pytest

from gtsfm_tpu.common.image import Image
from gtsfm_tpu.loader.base import LoaderBase
from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer


class _TinyLoader(LoaderBase):
    """4 tiny synthetic images (NetVLAD runs with random weights)."""

    def __init__(self, n=4):
        super().__init__(max_resolution=64)
        rng = np.random.default_rng(0)
        self._imgs = [
            (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8) for _ in range(n)
        ]

    def __len__(self):
        return len(self._imgs)

    def get_image_full_res(self, index):
        return Image(value_array=self._imgs[index])

    def get_camera_intrinsics_full_res(self, index):
        return np.asarray([100.0, 0.0, 0.0, 32.0, 32.0], np.float32)

    def get_camera_pose(self, index):
        return None

    def image_filenames(self):
        return [f"im{i}.png" for i in range(len(self))]


def test_retrieval_regime_requires_weights():
    cfg = PipelineConfig()
    cfg.retriever.regime = "retrieval"
    with pytest.raises(ValueError, match="netvlad_checkpoint"):
        SceneOptimizer(cfg).generate_pairs(_TinyLoader())


class _StubNetVLAD:
    """Tiny global-descriptor stand-in: these tests validate the retrieval
    WIRING (regime dispatch, similarity top-K, joint union), not the VGG16
    trunk — which has its own test (test_deep_models.test_netvlad_descriptor)
    and costs ~30 s of compile per pipeline construction."""

    def __init__(self, checkpoint_path=None):
        self.params = None

    def init_random(self, *a, **k):
        self.params = object()
        return self

    def __call__(self, images):
        import jax.numpy as jnp

        flat = images.reshape(images.shape[0], -1, images.shape[-1])
        d = jnp.concatenate(
            [flat.mean(axis=1), flat.std(axis=1), flat[:, ::257, :].reshape(images.shape[0], -1)],
            axis=-1,
        )
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@pytest.fixture()
def stub_netvlad(monkeypatch):
    from gtsfm_tpu.frontend.deep import netvlad

    monkeypatch.setattr(netvlad, "NetVLAD", _StubNetVLAD)


def test_retrieval_regime_random_weights(stub_netvlad):
    cfg = PipelineConfig()
    cfg.retriever.regime = "retrieval"
    cfg.retriever.allow_random_weights = True
    cfg.retriever.num_matched = 2
    cfg.retriever.min_score = -1.0  # random descriptors: accept anything
    pairs = SceneOptimizer(cfg).generate_pairs(_TinyLoader())
    assert len(pairs) >= 2
    assert all(a < b for a, b in pairs)


def test_joint_regime_includes_sequential_window(stub_netvlad):
    cfg = PipelineConfig()
    cfg.retriever.regime = "sequential_with_retrieval"
    cfg.retriever.allow_random_weights = True
    cfg.retriever.max_frame_lookahead = 1
    cfg.retriever.min_score = 2.0  # retrieval contributes nothing
    pairs = SceneOptimizer(cfg).generate_pairs(_TinyLoader())
    assert set(pairs) >= {(0, 1), (1, 2), (2, 3)}
