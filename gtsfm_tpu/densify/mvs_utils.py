"""MVS utilities: view-selection scoring, voxel downsampling, PSNR metrics.

Parity with reference gtsfm/densify/mvs_utils.py (triangulation angles :21/:54,
piecewise_gaussian :99, voxel scales :148, minimum voxel size :167,
downsample_point_cloud :194 — open3d voxel_down_sample re-implemented here as a
numpy grid-bucket average — downsampling PSNR :225, metrics group :259).

All functions are host-side numpy: they post-process a fused point cloud once
per run (no hot loop), so jit buys nothing.
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.evaluation.metrics import MetricsGroup

EPS = 1e-12


def calculate_triangulation_angles_in_degrees(
    camera_center_1: np.ndarray, camera_center_2: np.ndarray, points_3d: np.ndarray
) -> np.ndarray:
    """Angle at each 3D point between rays back-projected from two centers.

    camera_center_*: (3,) or (N,3); points_3d: (N,3). Vectorized, matching
    reference mvs_utils.py:54-95 (COLMAP triangulation.cc semantics).
    """
    rays1 = points_3d - np.atleast_2d(camera_center_1)
    rays2 = points_3d - np.atleast_2d(camera_center_2)
    rays1 = rays1 / np.maximum(np.linalg.norm(rays1, axis=-1, keepdims=True), EPS)
    rays2 = rays2 / np.maximum(np.linalg.norm(rays2, axis=-1, keepdims=True), EPS)
    dots = np.clip((rays1 * rays2).sum(axis=-1), -1.0, 1.0)
    return np.rad2deg(np.arccos(dots))


def piecewise_gaussian(
    theta: np.ndarray, theta_0: float = 5.0, sigma_1: float = 1.0, sigma_2: float = 10.0
) -> np.ndarray:
    """Two-sided Gaussian favoring baseline angle theta_0 (MVSNet view scoring,
    Yao et al. 2018 §"View Selection"; reference mvs_utils.py:99-123).
    Vectorized over theta."""
    theta = np.asarray(theta, np.float64)
    sigma = np.where(theta <= theta_0, sigma_1, sigma_2)
    return np.exp(-((theta - theta_0) ** 2) / (2.0 * sigma**2))


def cart_to_homogenous(non_homogenous_coordinates: np.ndarray) -> np.ndarray:
    """Append a row of ones: (d, N) -> (d+1, N). Reference mvs_utils.py:126."""
    if non_homogenous_coordinates.ndim != 2:
        raise TypeError("Input non-homogenous coordinates should be 2 dimensional")
    n = non_homogenous_coordinates.shape[1]
    return np.vstack([non_homogenous_coordinates, np.ones((1, n))])


def estimate_voxel_scales(points: np.ndarray) -> np.ndarray:
    """Semi-axis lengths of the centered cloud (descending singular values)."""
    from gtsfm_tpu.geometry import ellipsoid

    centered = ellipsoid.center_point_cloud(np.asarray(points, np.float64))
    _, singular_values = ellipsoid.get_right_singular_vectors(centered)
    return singular_values


def estimate_minimum_voxel_size(points: np.ndarray, scale: float = 0.02) -> float:
    """Minimum semi-axis length scaled by `scale` (reference :167-191)."""
    points = np.asarray(points)
    if points.shape[0] < 2:
        return 0.0
    return float(estimate_voxel_scales(points)[-1] * scale)


def downsample_point_cloud(
    points: np.ndarray, rgb: np.ndarray, voxel_size: float = 0.02
) -> tuple[np.ndarray, np.ndarray]:
    """Voxel-grid downsampling: one averaged point (and color) per occupied
    voxel — the open3d voxel_down_sample algorithm (reference :194-223)
    without the open3d dependency."""
    if voxel_size <= 0:
        return points, rgb
    points = np.asarray(points, np.float64)
    rgb = np.asarray(rgb)
    if points.shape[0] == 0:
        return points, rgb
    idx = np.floor((points - points.min(axis=0)) / voxel_size).astype(np.int64)
    _, inverse, counts = np.unique(idx, axis=0, return_inverse=True, return_counts=True)
    M = counts.shape[0]
    pts_out = np.zeros((M, 3))
    np.add.at(pts_out, inverse, points)
    pts_out /= counts[:, None]
    rgb_out = np.zeros((M, 3))
    np.add.at(rgb_out, inverse, rgb.astype(np.float64))
    rgb_out /= counts[:, None]
    return pts_out, rgb_out.astype(rgb.dtype)


def compute_downsampling_psnr(
    original_point_cloud: np.ndarray, downsampled_point_cloud: np.ndarray
) -> float:
    """Symmetric nearest-neighbor PSNR between original and downsampled clouds
    (Schnabel & Klein 2006; reference :225-257)."""
    from scipy.spatial import cKDTree

    est_voxel_scale = 2.0 * np.linalg.norm(estimate_voxel_scales(original_point_cloud))
    d_down_to_orig, _ = cKDTree(original_point_cloud).query(downsampled_point_cloud)
    d_orig_to_down, _ = cKDTree(downsampled_point_cloud).query(original_point_cloud)
    rms = lambda d: np.sqrt(np.square(d).mean())
    denom = max(rms(d_down_to_orig), rms(d_orig_to_down), EPS)
    return float(20.0 * np.log10(est_voxel_scale / denom))


def get_voxel_downsampling_metrics(
    min_voxel_size: float,
    original_point_cloud: np.ndarray,
    downsampled_point_cloud: np.ndarray,
) -> MetricsGroup:
    """Voxel-downsampling metrics group (reference :259-290)."""
    psnr = compute_downsampling_psnr(original_point_cloud, downsampled_point_cloud)
    g = MetricsGroup("voxel_downsampling_metrics")
    g.add("voxel size for downsampling", min_voxel_size)
    g.add("point cloud size before downsampling", original_point_cloud.shape[0])
    g.add("point cloud size after downsampling", downsampled_point_cloud.shape[0])
    g.add("compression ratio", original_point_cloud.shape[0] / (downsampled_point_cloud.shape[0] + EPS))
    g.add("downsampling PSNR", psnr)
    return g
