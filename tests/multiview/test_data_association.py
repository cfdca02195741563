"""Triangulation RANSAC tests (reference tests/data_association/
test_point3d_initializer.py strategy: synthetic tracks + outliers)."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.multiview import data_association as da
from tests.geometry.test_triangulation import make_scene


def unpack_scene(rng, n_cams=6, n_tracks=20, noise=0.3):
    wRi_t, wti_t, cal_t, uv, X = make_scene(rng, n_cams=n_cams, n_tracks=n_tracks, noise=noise)
    wRi = wRi_t[:, 0][0:1].repeat(1, 0)  # placeholder; rebuild below
    # make_scene tiles cameras per track; recover the camera arrays:
    wRi = np.asarray(wRi_t)[0]
    wti = np.asarray(wti_t)[0]
    cal = np.asarray(cal_t)[0]
    cam_idx = np.tile(np.arange(n_cams, dtype=np.int32)[None], (n_tracks, 1))
    mask = np.ones((n_tracks, n_cams), np.float32)
    return (
        jnp.asarray(wRi), jnp.asarray(wti), jnp.asarray(cal),
        jnp.asarray(cam_idx), jnp.asarray(np.asarray(uv)), jnp.asarray(mask),
        np.asarray(X),
    )


def test_clean_tracks_success(rng):
    wRi, wti, cal, cam_idx, uv, mask, X = unpack_scene(rng, noise=0.2)
    res = da.triangulate_tracks_robust(wRi, wti, cal, cam_idx, uv, mask)
    assert np.all(np.asarray(res.exit_codes) == da.TriangulationExitCode.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.points), X, atol=0.05)
    assert np.asarray(res.inlier_mask).mean() > 0.95


def test_outlier_measurements_rejected(rng):
    wRi, wti, cal, cam_idx, uv, mask, X = unpack_scene(rng, noise=0.2)
    uv = np.asarray(uv).copy()
    # Corrupt one measurement per track (gross outlier).
    uv[:, 2] += 80.0
    res = da.triangulate_tracks_robust(
        wRi, wti, cal, cam_idx, jnp.asarray(uv), mask, reproj_thresh_px=5.0
    )
    assert np.all(np.asarray(res.exit_codes) == da.TriangulationExitCode.SUCCESS)
    # Corrupted column excluded, points still accurate (plain DLT would drift).
    assert np.asarray(res.inlier_mask)[:, 2].mean() < 0.1
    np.testing.assert_allclose(np.asarray(res.points), X, atol=0.05)


def test_exit_code_insufficient_measurements(rng):
    wRi, wti, cal, cam_idx, uv, mask, X = unpack_scene(rng)
    mask = np.asarray(mask).copy()
    mask[0, 1:] = 0.0  # track 0 has a single measurement
    res = da.triangulate_tracks_robust(wRi, wti, cal, cam_idx, uv, jnp.asarray(mask))
    codes = np.asarray(res.exit_codes)
    assert codes[0] == da.TriangulationExitCode.INSUFFICIENT_MEASUREMENTS
    assert np.all(codes[1:] == da.TriangulationExitCode.SUCCESS)


def test_exit_code_histogram():
    codes = np.asarray([0, 0, 2, 3, 4, 0])
    h = da.exit_code_histogram(codes)
    assert h["success"] == 3
    assert h["insufficient_measurements"] == 1
    assert h["exceeds_reproj_threshold"] == 1
    assert h["insufficient_angle"] == 1


def test_no_ransac_mode_matches_on_clean_data(rng):
    wRi, wti, cal, cam_idx, uv, mask, X = unpack_scene(rng, noise=0.1)
    r1 = da.triangulate_tracks_robust(wRi, wti, cal, cam_idx, uv, mask, use_ransac=True)
    r2 = da.triangulate_tracks_robust(wRi, wti, cal, cam_idx, uv, mask, use_ransac=False)
    np.testing.assert_allclose(np.asarray(r1.points), np.asarray(r2.points), atol=0.02)


def test_sampled_hypotheses_long_tracks(rng):
    """C(L,2) > max_hypotheses triggers the per-track sampled-pair path
    (reference RANSAC_SAMPLE_UNIFORM, point3d_initializer.py:143): outliers
    still rejected, clean tracks still accurate, partial tracks respected."""
    n_cams, n_tracks = 24, 12  # C(24,2)=276 > 64
    wRi, wti, cal, cam_idx, uv, mask, X = unpack_scene(
        rng, n_cams=n_cams, n_tracks=n_tracks, noise=0.2
    )
    uv = np.asarray(uv).copy()
    uv[:, 3] += 80.0  # slot-3 measurement corrupted on every track
    mask = np.asarray(mask).copy()
    mask[0, 10:] = 0.0  # track 0 is partial (slot-packed 10 measurements)
    res = da.triangulate_tracks_robust(
        wRi, wti, cal, cam_idx, jnp.asarray(uv), jnp.asarray(mask),
        max_hypotheses=64,
    )
    codes = np.asarray(res.exit_codes)
    assert np.all(codes == da.TriangulationExitCode.SUCCESS)
    assert np.asarray(res.inlier_mask)[:, 3].mean() < 0.1
    np.testing.assert_allclose(np.asarray(res.points), X, atol=0.05)


def test_triangulation_track_chunking_equivalence(rng):
    """track_chunk slabs must reproduce the one-shot result exactly — the
    chunking exists because the one-shot hypothesis tensor OOMed at the
    1024-image scale (r5)."""
    from gtsfm_tpu.geometry import cameras

    n_cams, T, L = 6, 40, 4
    cal = np.tile(np.asarray([500.0, 0, 0, 320.0, 240.0], np.float32), (n_cams, 1))
    wRi = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    wti = np.stack([np.asarray([2.0 * i, 0, -8], np.float32) for i in range(n_cams)])
    X = rng.uniform(-2, 2, size=(T, 3)).astype(np.float32)
    cam_idx = jnp.asarray(rng.integers(0, n_cams, size=(T, L)), jnp.int32)
    uv, _ = cameras.project_bundler(
        jnp.asarray(wRi)[cam_idx], jnp.asarray(wti)[cam_idx],
        jnp.asarray(cal)[cam_idx], jnp.asarray(X)[:, None, :],
    )
    mask = jnp.ones((T, L))
    args = (jnp.asarray(wRi), jnp.asarray(wti), jnp.asarray(cal),
            cam_idx, uv, mask)
    one = da.triangulate_tracks_robust(*args, track_chunk=4096)
    chunked = da.triangulate_tracks_robust(*args, track_chunk=16)
    for a, b in zip(one, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
