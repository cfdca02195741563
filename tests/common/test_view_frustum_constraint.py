"""View-frustum geometry + Hilti Constraint row-format IO
(reference gtsfm/common/view_frustum.py, gtsfm/common/constraint.py)."""

import numpy as np

from gtsfm_tpu.common.constraint import Constraint
from gtsfm_tpu.common.view_frustum import (
    frustum_points,
    frustum_rays,
    frustums_overlap,
)

CAL = np.asarray([300.0, 0.0, 0.0, 320.0, 240.0])
W, H = 640, 480


def test_frustum_rays_unit_and_center():
    rays = frustum_rays(CAL, W, H)
    assert rays.shape == (5, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-12)
    # Center pixel = principal point -> optical axis.
    np.testing.assert_allclose(rays[4], [0.0, 0.0, 1.0], atol=1e-12)
    # All rays point forward.
    assert np.all(rays[:, 2] > 0)


def test_frustum_points_layout():
    wRi = np.eye(3)
    wti = np.asarray([1.0, 2.0, 3.0])
    pts = frustum_points(wRi, wti, CAL, W, H, near=0.5, far=4.0)
    assert pts.shape == (9, 3)
    np.testing.assert_allclose(pts[0], wti)
    # Far corners are 8x the near offsets from the apex.
    np.testing.assert_allclose(pts[5:] - wti, 8.0 * (pts[1:5] - wti), atol=1e-9)


def test_frustums_overlap_same_and_opposite():
    I = np.eye(3)
    z0 = np.zeros(3)
    # Identical cameras obviously overlap.
    assert frustums_overlap(I, z0, CAL, I, z0.copy(), CAL, W, H)
    # Back-to-back cameras (B rotated 180 deg about y, far apart) do not.
    Ry = np.asarray([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], float)
    assert not frustums_overlap(I, z0, CAL, Ry, np.asarray([0, 0, -50.0]), CAL, W, H)


def _random_constraint(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3)
    th = np.linalg.norm(w)
    k = w / th
    Kx = np.asarray([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    return Constraint(
        a=2, b=5, aRb=R, atb=rng.normal(size=3),
        cov=rng.normal(size=(6, 6)), counts=rng.integers(0, 9, (5, 5)).astype(float),
    )


def test_constraint_row_roundtrip():
    c = _random_constraint()
    row = c.to_row()
    assert row.shape == (75,)
    c2 = Constraint.from_row(row)
    assert (c2.a, c2.b) == (2, 5)
    np.testing.assert_allclose(c2.aRb, c.aRb)
    np.testing.assert_allclose(c2.atb, c.atb)
    np.testing.assert_allclose(c2.cov, c.cov)
    np.testing.assert_allclose(c2.counts, c.counts)


def test_constraint_file_roundtrip(tmp_path):
    cs = [_random_constraint(s) for s in range(3)]
    f = str(tmp_path / "constraints.txt")
    Constraint.write(f, cs)
    back = Constraint.read(f)
    assert len(back) == 3
    for c, c2 in zip(cs, back):
        np.testing.assert_allclose(c2.aRb, c.aRb, atol=1e-10)
        np.testing.assert_allclose(c2.cov, c.cov, atol=1e-10)
