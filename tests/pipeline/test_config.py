"""Config system tests: dotted overrides + YAML config files + presets.

Mirrors the reference's two-tier Hydra-YAML + argparse config composition
(gtsfm/runner/gtsfm_runner_base.py:164-200, gtsfm/configs/*.yaml).
"""

import os
import textwrap

import pytest

from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.runner.__main__ import resolve_config_path

CONFIGS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "gtsfm_tpu", "configs",
)


def test_apply_overrides_types():
    cfg = PipelineConfig()
    cfg.apply_overrides(
        [
            "frontend.max_keypoints=1024",
            "two_view.ba_enabled=false",
            "multi_view.ba_reproj_thresholds_px=8,4",
            "two_view.estimation_threshold_px=2.5",
            "frontend.lightglue_depth_confidence=0.95",
        ]
    )
    assert cfg.frontend.max_keypoints == 1024
    assert cfg.two_view.ba_enabled is False
    assert cfg.multi_view.ba_reproj_thresholds_px == (8.0, 4.0)
    assert cfg.two_view.estimation_threshold_px == 2.5
    assert cfg.frontend.lightglue_depth_confidence == 0.95


def test_apply_yaml(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        textwrap.dedent(
            """
            frontend:
              feature_type: orb
              max_keypoints: 2048
            two_view:
              degeneracy_check: true
            multi_view:
              ba_reproj_thresholds_px: [6.0, 3.0]
            max_resolution: 512
            """
        )
    )
    cfg = PipelineConfig().apply_yaml(str(y))
    assert cfg.frontend.feature_type == "orb"
    assert cfg.frontend.max_keypoints == 2048
    assert cfg.two_view.degeneracy_check is True
    assert cfg.multi_view.ba_reproj_thresholds_px == (6.0, 3.0)
    assert cfg.max_resolution == 512


def test_cli_override_wins_over_yaml(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("frontend:\n  max_keypoints: 2048\n")
    cfg = PipelineConfig().apply_yaml(str(y)).apply_overrides(
        ["frontend.max_keypoints=512"]
    )
    assert cfg.frontend.max_keypoints == 512


@pytest.mark.parametrize("preset", ["sift_front_end", "deep_front_end", "unified"])
def test_bundled_presets_load(preset):
    path = resolve_config_path(preset)
    assert path.startswith(CONFIGS_DIR)
    cfg = PipelineConfig().apply_yaml(path)
    if preset == "deep_front_end":
        assert cfg.frontend.feature_type == "superpoint"
        assert cfg.frontend.matcher_type == "lightglue"
    else:
        assert cfg.frontend.feature_type == "sift"
    if preset == "unified":
        assert cfg.two_view.degeneracy_check is True


def test_resolve_config_path_missing():
    with pytest.raises(FileNotFoundError):
        resolve_config_path("no_such_config")
