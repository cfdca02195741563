"""Full-pipeline integration test on the real 12-image Lund door dataset.

Mirrors reference tests/test_gtsfm_runner_olssonloader.py:20-39: run the
complete reconstruction and assert recovered global poses match GT within
compare_global_poses(trans_err_atol=1.0, trans_err_rtol=0.1, rot 5 deg).
Slowest test in the suite (a few minutes cold; fast with warm caches).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_DATA, reference_data_available

DOOR = os.path.join(REFERENCE_DATA, "set1_lund_door")

pytestmark = pytest.mark.skipif(
    not reference_data_available(), reason="reference test data not mounted"
)


def test_door_end_to_end(tmp_path):
    from gtsfm_tpu.geometry import alignment
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

    loader = OlssonLoader(DOOR, max_frame_lookahead=12, max_resolution=760)
    cfg = PipelineConfig(
        output_root=str(tmp_path / "results"),
        cache_dir="/tmp/gtsfm_cache",  # shared across runs: front-end resume
    )
    result = SceneOptimizer(cfg).run(loader)

    # Reference integration criterion.
    wRi_gt, wti_gt, valid = loader.get_all_poses()
    assert alignment.compare_global_poses(
        result.scene.wRi, result.scene.wti,
        jnp.asarray(wRi_gt), jnp.asarray(wti_gt),
        rot_err_thresh_deg=5.0, trans_err_atol=1.0, trans_err_rtol=0.1,
    )

    # Reconstruction sanity: dense-enough scene, sub-pixel reprojection.
    assert result.scene.num_tracks() > 1000
    err, _ = result.scene.reprojection_errors()
    live = np.asarray(result.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 1.0

    # COLMAP export exists and re-ingests.
    out = tmp_path / "results" / "ba_output"
    assert (out / "cameras.txt").exists()
    from gtsfm_tpu.loader.colmap import ColmapLoader

    re_loader = ColmapLoader(str(out))
    assert len(re_loader) == 12

    # Metrics written.
    assert (tmp_path / "results" / "result_metrics" / "summary.json").exists()
