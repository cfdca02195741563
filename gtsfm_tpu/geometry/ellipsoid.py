"""Ortho-axis alignment of a reconstructed scene via PCA of its point cloud.

Parity with reference gtsfm/utils/ellipsoid.py (get_ortho_axis_alignment_transform
:17, center_point_cloud :47, remove_outlier_points :67, SVD rotation :91) as
applied by reference gtsfm/scene_optimizer.py:303 before visualization export.

Host-side numpy: this runs once on the final (already device-computed) scene,
so there is nothing to jit — the cost is one 3x3 eigendecomposition.
"""

from __future__ import annotations

import dataclasses

import numpy as np

OUTLIER_DISTANCE_PERCENTILE = 95


def center_point_cloud(point_cloud: np.ndarray) -> np.ndarray:
    """Subtract the centroid. point_cloud: (N, 3)."""
    if point_cloud.ndim != 2 or point_cloud.shape[1] != 3:
        raise TypeError("Points list should be 3D")
    return point_cloud - point_cloud.mean(axis=0)


def remove_outlier_points(point_cloud: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop the top 5% of points by distance from the origin.

    Returns (filtered (M,3), inlier_mask (N,) bool).
    """
    if point_cloud.ndim != 2 or point_cloud.shape[1] != 3:
        raise TypeError("Point Cloud should be 3 dimensional")
    mags = np.linalg.norm(point_cloud, axis=1)
    cutoff = np.percentile(mags, OUTLIER_DISTANCE_PERCENTILE)
    inlier_mask = mags < cutoff
    return point_cloud[inlier_mask], inlier_mask


def get_right_singular_vectors(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Right singular vectors + singular values of an (N,3) cloud, descending.

    Eigendecomposition of the Bessel-corrected covariance A^T A / (N-1), as in
    the reference (ellipsoid.py:121-152).
    """
    N, D = A.shape
    if D != 3:
        raise TypeError("Point Cloud should be 3 dimensional")
    eigvals, eigvecs = np.linalg.eigh(A.T @ A / max(N - 1, 1))
    order = np.argsort(-eigvals)
    return eigvecs[:, order], np.sqrt(np.maximum(eigvals[order], 0.0))


def get_alignment_rotation_matrix_from_svd(point_cloud: np.ndarray) -> np.ndarray:
    """Rotation aligning the cloud's principal axes with x, y, z.

    If V^T is a reflection (det = -1) it is converted to a proper rotation
    (reference ellipsoid.py:108-115 via Rot3.ClosestTo). For an orthogonal
    matrix every such projection is distance-equal, so we pick the one that
    preserves the principal-axis assignment: negate the least-principal axis.
    """
    V, _ = get_right_singular_vectors(point_cloud)
    Vt = V.T.copy()
    if np.linalg.det(Vt) < 0:
        Vt[2] = -Vt[2]
    return Vt


def get_ortho_axis_alignment_transform(points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rigid (R, t) aligning a point cloud to the coordinate axes.

    Matches reference ellipsoid.py:17-44: filter 95th-percentile outliers,
    center, PCA rotation, then translate so the rotated inlier centroid sits at
    the origin. Aligned point = R @ p + t.

    points: (N, 3) float array (already masked to live tracks).
    """
    points = np.asarray(points, np.float64)
    if points.shape[0] < 2:
        return np.eye(3), np.zeros(3)
    points_filtered, inlier_mask = remove_outlier_points(points)
    points_centered = center_point_cloud(points_filtered)
    R = get_alignment_rotation_matrix_from_svd(points_centered)
    rotated_mean = (points @ R.T)[inlier_mask].mean(axis=0)
    return R, -rotated_mean


def align_scene_to_ortho_axes(scene):
    """Apply the ortho-axis transform to a SceneData (cameras + points).

    Reference scene_optimizer.py:284-308 (align_estimated_gtsfm_data): the
    transform is computed from the BA output cloud and applied as a Sim(3)
    with s=1 to cameras and landmarks. Returns (aligned_scene, (R, t)).
    """
    import jax.numpy as jnp

    pts = np.asarray(scene.points)
    live = np.asarray(scene.track_mask) > 0
    R, t = get_ortho_axis_alignment_transform(pts[live])
    Rf = R.astype(np.float32)
    tf = t.astype(np.float32)
    new = dataclasses.replace(
        scene,
        wRi=jnp.asarray(Rf[None] @ np.asarray(scene.wRi)),
        wti=jnp.asarray(np.asarray(scene.wti) @ Rf.T + tf),
        points=jnp.asarray(pts @ Rf.T + tf),
    )
    return new, (R, t)
