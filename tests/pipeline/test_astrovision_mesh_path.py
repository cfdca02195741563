"""Astrovision end-to-end with GT-mesh correspondence classification:
the 4-image Vesta opnav segment (reference fixture) drives the full
pipeline and the mesh ray-cast GT metric must appear (VERDICT r2 item 6;
reference utils/metrics.py:69-96 prefers the mesh over epipolar checks
when the loader supplies one)."""

import os

import numpy as np
import pytest

SEG = "/root/reference/tests/data/astrovision/test_2011212_opnav_022"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SEG), reason="astrovision fixture not mounted"
)


def test_mesh_metric_in_full_run(tmp_path):
    from gtsfm_tpu.loader.astrovision import AstrovisionLoader
    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

    loader = AstrovisionLoader(SEG, max_resolution=256)
    # vesta_5002.ply is auto-discovered next to the COLMAP model.
    mesh = loader.get_gt_scene_mesh()
    assert mesh is not None
    verts, faces = mesh
    assert verts.shape[1] == 3 and faces.shape[1] == 3

    cfg = PipelineConfig(enable_cache=False, max_resolution=256,
                         output_root=str(tmp_path / "out"))
    cfg.frontend.max_keypoints = 512
    opt = SceneOptimizer(cfg)
    result = opt.run(loader, save_outputs=False)
    names = {g.name: g for g in result.metrics}
    # The mesh-based GT classification surfaces as the per-pair
    # inlier_ratio_wrt_gt_model distribution (scene_optimizer wiring).
    found = [
        g for g in result.metrics
        if any("gt_model" in m.name for m in g.metrics)
    ]
    assert found, sorted(names)
