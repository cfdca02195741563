import os

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.io import colmap_io
from gtsfm_tpu.geometry import lie
from tests.common.test_scene import build_test_scene


def test_colmap_roundtrip(tmp_path, rng):
    sc, X = build_test_scene(rng)
    out = str(tmp_path / "model")
    names = [f"img_{i}.jpg" for i in range(3)]
    colmap_io.export_scene_as_colmap_text(sc, out, file_names=names, image_sizes=[(640, 480)] * 3)
    assert os.path.exists(os.path.join(out, "cameras.txt"))

    cams, sizes = colmap_io.read_cameras_txt(os.path.join(out, "cameras.txt"))
    assert sizes[1] == (640, 480)
    np.testing.assert_allclose(cams[1], np.asarray(sc.cal)[0], atol=1e-4)

    images = colmap_io.read_images_txt(os.path.join(out, "images.txt"))
    assert len(images) == 3
    for img_id, (wRi, wti, cam_id, name) in images.items():
        i = img_id - 1
        err = float(lie.rotation_angular_distance(jnp.asarray(wRi), sc.wRi[i]))
        assert err < 1e-4
        np.testing.assert_allclose(wti, np.asarray(sc.wti)[i], atol=1e-4)
        assert name == names[i]

    pts, cols, tracks = colmap_io.read_points3d_txt(os.path.join(out, "points3D.txt"))
    assert pts.shape == (5, 3)
    np.testing.assert_allclose(pts, X, atol=1e-4)
    # each track observed in 3 images
    assert all(len(t) == 3 for t in tracks)


def test_ply_write(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    colmap_io.write_ply(path, pts)
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 10" in lines[2]
    assert len(lines) == 10 + 10  # header(10 lines incl end_header) + 10 pts
