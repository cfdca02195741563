import numpy as np

from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup, save_metrics_reports
from gtsfm_tpu.evaluation.report import generate_metrics_report_html


def make_groups(rng):
    g1 = MetricsGroup("bundle_adjustment_metrics")
    g1.add("number_cameras", 12)
    g1.add("reprojection_errors_px", rng.random(500) * 3)
    g2 = MetricsGroup("two_view_metrics")
    g2.add("inlier_ratios", rng.random(60))
    return [g1, g2]


def test_metrics_json_roundtrip(tmp_path, rng):
    groups = make_groups(rng)
    save_metrics_reports(groups, str(tmp_path))
    assert (tmp_path / "summary.json").exists()
    g = MetricsGroup.from_json(str(tmp_path / "bundle_adjustment_metrics.json"))
    assert g.name == "bundle_adjustment_metrics"
    names = [m.name for m in g.metrics]
    assert "number_cameras" in names and "reprojection_errors_px" in names
    dist = [m for m in g.metrics if m.name == "reprojection_errors_px"][0]
    assert np.asarray(dist.data).shape == (500,)


def test_html_report(tmp_path, rng):
    groups = make_groups(rng)
    path = generate_metrics_report_html(groups, str(tmp_path / "report.html"))
    text = open(path).read()
    assert "<svg" in text  # histograms rendered
    assert "bundle_adjustment_metrics" in text
    assert "number_cameras" in text
    assert "</html>" in text


def test_process_graph(tmp_path):
    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.ui.process_graph import save_process_graph

    svg = save_process_graph(PipelineConfig(), str(tmp_path))
    text = open(svg).read()
    assert "<svg" in text
    assert (tmp_path / "process_graph.dot").exists()
    dot = open(tmp_path / "process_graph.dot").read()
    assert "Rotation averaging" in dot
    assert "->" in dot
