"""Tests for ortho-axis (PCA) scene alignment.

Mirrors reference tests/utils/test_ellipsoid.py semantics: centering, outlier
removal, SVD alignment rotation, and the end-to-end transform.
"""

import numpy as np
import pytest

from gtsfm_tpu.geometry import ellipsoid


def test_center_point_cloud():
    pts = np.array([[1.0, 2.0, 3.0], [3.0, 4.0, 5.0]])
    centered = ellipsoid.center_point_cloud(pts)
    np.testing.assert_allclose(centered.mean(axis=0), 0.0, atol=1e-12)


def test_center_point_cloud_wrong_dims():
    with pytest.raises(TypeError):
        ellipsoid.center_point_cloud(np.zeros((5, 2)))


def test_remove_outlier_points():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3))
    pts[0] = [100.0, 100.0, 100.0]  # gross outlier
    filtered, mask = ellipsoid.remove_outlier_points(pts)
    assert not mask[0]
    assert filtered.shape[0] == mask.sum()
    # top 5% by magnitude dropped
    assert filtered.shape[0] <= 0.96 * 200


def test_alignment_rotation_elongated_cloud():
    """Points stretched along a known direction: the principal axis must map
    to x after alignment."""
    rng = np.random.default_rng(1)
    d = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    t = rng.normal(size=(500, 1)) * 10.0
    pts = t * d + 0.01 * rng.normal(size=(500, 3))
    R = ellipsoid.get_alignment_rotation_matrix_from_svd(pts)
    # proper rotation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.isclose(np.linalg.det(R), 1.0)
    aligned = pts @ R.T
    # x now carries (almost) all the variance
    var = aligned.var(axis=0)
    assert var[0] > 100 * var[1] and var[0] > 100 * var[2]


def test_get_ortho_axis_alignment_transform_centers_cloud():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)) * np.array([5.0, 1.0, 0.2]) + np.array([10.0, -4.0, 7.0])
    R, t = ellipsoid.get_ortho_axis_alignment_transform(pts)
    aligned = pts @ R.T + t
    # rotated inlier mean sits at the origin (reference ellipsoid.py:37-41)
    _, inlier_mask = ellipsoid.remove_outlier_points(pts)
    assert np.linalg.norm(aligned[inlier_mask].mean(axis=0)) < 1e-9
    # principal variance ordering x >= y >= z
    var = aligned.var(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_align_scene_to_ortho_axes_rigid_invariance():
    """The transform must be rigid: pairwise distances between camera centers
    and reprojection geometry are preserved."""
    import jax.numpy as jnp

    from tests.bundle.test_ba import make_ragged_problem

    sc = make_ragged_problem(np.random.default_rng(3))
    aligned, (R, t) = ellipsoid.align_scene_to_ortho_axes(sc)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-9)
    d0 = np.linalg.norm(np.asarray(sc.wti)[0] - np.asarray(sc.wti)[1])
    d1 = np.linalg.norm(np.asarray(aligned.wti)[0] - np.asarray(aligned.wti)[1])
    assert np.isclose(d0, d1, rtol=1e-5)
    # reprojection errors identical (rigid world transform)
    e0, _ = sc.reprojection_errors()
    e1, _ = aligned.reprojection_errors()
    m = np.asarray(sc.meas_mask) > 0
    np.testing.assert_allclose(
        np.asarray(e0)[m], np.asarray(e1)[m], rtol=1e-3, atol=1e-3
    )
