"""Web 3D viewer export tests (rtf_vis_tool equivalent)."""

import json
import os
import re

from gtsfm_tpu.io import colmap_io
from gtsfm_tpu.visualization import web_viewer
from tests.common.test_scene import build_test_scene


def _export_model(tmp_path, rng):
    sc, X = build_test_scene(rng)
    out = str(tmp_path / "model")
    names = [f"img_{i}.jpg" for i in range(3)]
    colmap_io.export_scene_as_colmap_text(sc, out, file_names=names, image_sizes=[(640, 480)] * 3)
    return out


def test_payload(tmp_path, rng):
    model = _export_model(tmp_path, rng)
    payload = web_viewer.scene_payload_from_colmap(model)
    assert payload["num_cameras"] == 3
    # 8 wireframe segments per camera frustum.
    assert len(payload["frusta"]) == 8 * 3
    assert len(payload["points"]) == len(payload["colors"])
    assert len(payload["points"]) > 0
    assert all(len(p) == 3 for p in payload["points"])
    assert all(len(s) == 6 for s in payload["frusta"])


def test_export_html(tmp_path, rng):
    model = _export_model(tmp_path, rng)
    metrics_dir = str(tmp_path / "metrics")
    os.makedirs(metrics_dir)
    with open(os.path.join(metrics_dir, "summary.json"), "w") as f:
        json.dump({"ba_metrics": {"num_tracks": 17}}, f)
    out = str(tmp_path / "viewer.html")
    web_viewer.export_web_viewer(model, out, metrics_dir=metrics_dir)
    html_text = open(out).read()
    # Embedded payload must parse back as JSON.
    m = re.search(
        r"<script type=\"application/json\" id=\"scene-data\">(.*?)</script>",
        html_text, re.S,
    )
    payload = json.loads(m.group(1))
    assert payload["num_cameras"] == 3
    # Metrics sidebar rendered.
    assert "num_tracks" in html_text and "17" in html_text
    # Viewer JS is embedded and brace-balanced (crude syntax sanity).
    js = web_viewer._VIEWER_JS
    for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert js.count(o) == js.count(c), f"unbalanced {o}{c}"


def test_max_points_subsample(tmp_path, rng):
    model = _export_model(tmp_path, rng)
    payload = web_viewer.scene_payload_from_colmap(model, max_points=5)
    assert len(payload["points"]) == 5
