"""Pipeline robustness: largest-CC pruning (reference
multi_view_optimizer.py:123 -> utils/graph.py:42) and graceful degradation on
empty stages (reference verifier_base.py:56 / bundle_adjustment.py:319-324
keep-running-and-report semantics)."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.multiview import viewgraph


def _random_rotations(rng, n):
    import jax.numpy as jnp

    return np.asarray(
        [np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.3))) for _ in range(n)]
    )


def test_largest_cc_drops_smaller_component(rng):
    # Component A: nodes 0-3 (fully connected chain+extra), component B: 4-5.
    edges = np.asarray(
        [(0, 1), (1, 2), (2, 3), (0, 2), (4, 5)], np.int64
    )
    R = _random_rotations(rng, edges.shape[0])
    U = rng.normal(size=(edges.shape[0], 3)).astype(np.float32)

    kept_edges, (kept_R, kept_U), cc_mask = (
        viewgraph.prune_to_largest_connected_component(6, edges, R, U)
    )
    assert cc_mask.tolist() == [True, True, True, True, False, False]
    assert kept_edges.shape == (4, 2)
    assert (kept_edges < 4).all()  # the (4,5) edge is gone, not blended
    assert kept_R.shape == (4, 3, 3) and kept_U.shape == (4, 3)
    # Attribute rows track their edges.
    np.testing.assert_array_equal(kept_R, R[:4])


def test_largest_cc_isolated_nodes_excluded(rng):
    edges = np.asarray([(1, 2), (2, 3)], np.int64)
    R = _random_rotations(rng, 2)
    kept_edges, (kept_R,), cc_mask = (
        viewgraph.prune_to_largest_connected_component(5, edges, R)
    )
    # Nodes 0 and 4 have no edges at all.
    assert cc_mask.tolist() == [False, True, True, True, False]
    assert kept_edges.shape == (2, 2)


def test_largest_cc_empty_graph():
    edges = np.zeros((0, 2), np.int64)
    kept_edges, attrs, cc_mask = (
        viewgraph.prune_to_largest_connected_component(4, edges)
    )
    assert kept_edges.shape[0] == 0
    assert not cc_mask.any()


@pytest.fixture()
def noise_dataset(tmp_path, rng):
    os.makedirs(tmp_path / "images")
    for i in range(4):
        PILImage.fromarray(
            (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / "images" / f"img_{i:02d}.jpg")
    return str(tmp_path)


def test_graceful_degradation_on_unmatchable_images(noise_dataset, tmp_path):
    """Pure-noise images produce no verifiable geometry; the pipeline must
    emit a degraded (empty) result + metrics instead of raising."""
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

    loader = OlssonLoader(noise_dataset, max_resolution=96, image_extension="jpg")
    out = str(tmp_path / "results")
    cfg = PipelineConfig(enable_cache=False, output_root=out)
    cfg.frontend.max_keypoints = 128
    cfg.two_view.num_hypotheses = 64

    result = SceneOptimizer(cfg).run(loader)
    assert result.scene.num_cameras() == 0  # nothing reconstructed
    names = {g.name for g in result.metrics}
    assert "total_summary_metrics" in names
    summary = [g for g in result.metrics if g.name == "total_summary_metrics"][0]
    assert any(m.name == "degraded_reason" for m in summary.metrics)
    # Metrics artifacts still written.
    assert os.path.exists(os.path.join(out, "result_metrics", "summary.json"))
