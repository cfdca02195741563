"""Process-graph generation (reference ui/process_graph_generator.py:33)."""

import os

from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.ui.process_graph import pipeline_stages, save_process_graph, to_dot


def test_stages_reflect_config():
    cfg = PipelineConfig()
    cfg.frontend.feature_type = "orb"
    cfg.retriever.regime = "sequential"
    names = [s.name for s in pipeline_stages(cfg)]
    assert any("orb" in n for n in names)
    assert any("sequential" in n for n in names)
    assert any("bundle adjustment" in n.lower() for n in names)


def test_dot_has_edges():
    dot = to_dot(pipeline_stages(PipelineConfig()))
    assert dot.startswith("digraph")
    assert "->" in dot
    # dataflow: matcher consumes the detector's descriptors
    assert 'label="descriptors"' in dot


def test_save_process_graph(tmp_path):
    out = save_process_graph(PipelineConfig(), str(tmp_path))
    assert os.path.exists(out)
    dot_path = os.path.join(str(tmp_path), "process_graph.dot")
    assert os.path.exists(dot_path)
