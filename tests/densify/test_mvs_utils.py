"""Tests for MVS utilities (reference tests/densify/test_mvs_utils.py)."""

import numpy as np

from gtsfm_tpu.densify import mvs_utils


def test_triangulation_angles():
    c1 = np.array([0.0, 0.0, 0.0])
    c2 = np.array([2.0, 0.0, 0.0])
    pts = np.array([[1.0, 0.0, 1.0], [1.0, 0.0, 100.0]])
    ang = mvs_utils.calculate_triangulation_angles_in_degrees(c1, c2, pts)
    np.testing.assert_allclose(ang[0], 90.0, atol=1e-6)
    assert ang[1] < 2.0  # far point -> tiny angle


def test_piecewise_gaussian():
    # peak at theta_0
    assert np.isclose(mvs_utils.piecewise_gaussian(5.0), 1.0)
    # reference parity values: exp(-(theta-5)^2 / (2 sigma^2))
    assert np.isclose(mvs_utils.piecewise_gaussian(4.0), np.exp(-1.0 / 2.0))
    assert np.isclose(mvs_utils.piecewise_gaussian(15.0), np.exp(-100.0 / 200.0))
    # vectorized
    v = mvs_utils.piecewise_gaussian(np.array([4.0, 5.0, 15.0]))
    assert v.shape == (3,) and v[1] == 1.0


def test_cart_to_homogenous():
    x = np.arange(6, dtype=float).reshape(2, 3)
    h = mvs_utils.cart_to_homogenous(x)
    assert h.shape == (3, 3)
    np.testing.assert_allclose(h[-1], 1.0)


def test_voxel_downsample_basic():
    # two tight clusters strictly inside distinct voxels -> exactly two
    # output points, each the centroid (and color average) of its cluster
    a = np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]])
    b = np.array([[2.3, 0.0, 0.0], [2.5, 0.0, 0.0]])
    pts = np.vstack([a, b])
    rgb = np.array([[255, 0, 0], [255, 0, 0], [0, 255, 0], [0, 255, 0]], np.uint8)
    dpts, drgb = mvs_utils.downsample_point_cloud(pts, rgb, voxel_size=1.0)
    assert dpts.shape[0] == 2
    order = np.argsort(dpts[:, 0])
    np.testing.assert_allclose(dpts[order[0]], a.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(dpts[order[1]], b.mean(axis=0), atol=1e-9)
    assert drgb[order[0]][0] > 200 and drgb[order[1]][1] > 200


def test_voxel_downsample_noop_for_invalid_size():
    pts = np.zeros((4, 3))
    rgb = np.zeros((4, 3))
    dpts, drgb = mvs_utils.downsample_point_cloud(pts, rgb, voxel_size=0.0)
    assert dpts is pts and drgb is rgb


def test_estimate_minimum_voxel_size():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1000, 3)) * np.array([10.0, 5.0, 1.0])
    v = mvs_utils.estimate_minimum_voxel_size(pts, scale=0.02)
    # smallest semi-axis ~1 -> voxel ~0.02
    assert 0.01 < v < 0.04
    assert mvs_utils.estimate_minimum_voxel_size(pts[:1]) == 0.0


def test_downsampling_psnr_and_metrics():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(2000, 3))
    rgb = rng.integers(0, 255, size=(2000, 3)).astype(np.uint8)
    v = mvs_utils.estimate_minimum_voxel_size(pts, scale=0.05)
    dpts, _ = mvs_utils.downsample_point_cloud(pts, rgb, v)
    psnr = mvs_utils.compute_downsampling_psnr(pts, dpts)
    assert psnr > 20.0  # mild compression keeps high PSNR
    g = mvs_utils.get_voxel_downsampling_metrics(v, pts, dpts)
    names = [m.name for m in g.metrics]
    assert "downsampling PSNR" in names and "compression ratio" in names


def test_pairwise_view_scores_favors_good_baselines():
    """Cameras on a wide arc share well-conditioned (~theta_0) angles and must
    outscore a near-coincident pair."""
    import jax.numpy as jnp

    from gtsfm_tpu.common import scene as scene_mod
    from gtsfm_tpu.densify.plane_sweep import pairwise_view_scores, select_source_views

    # 3 cameras: 0 and 1 nearly coincident, 2 at a ~6 deg baseline from 0.
    centers = np.array([[0.0, 0.0, 0.0], [0.001, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    wRi = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    pts = np.array([[0.5, 0.0, 10.0]] * 8, np.float32) + np.linspace(0, 0.1, 8)[:, None].astype(np.float32)
    T = pts.shape[0]
    meas_cam, meas_track, uv = [], [], []
    for j in range(T):
        for i in range(3):
            meas_cam.append(i)
            meas_track.append(j)
            uv.append([0.0, 0.0])
    sc = scene_mod.SceneData(
        wRi=jnp.asarray(wRi), wti=jnp.asarray(centers),
        cal=jnp.tile(jnp.asarray([100.0, 0, 0, 0, 0], jnp.float32), (3, 1)),
        camera_mask=jnp.ones(3),
        points=jnp.asarray(pts), track_mask=jnp.ones(T),
        meas_cam=jnp.asarray(meas_cam, jnp.int32),
        meas_track=jnp.asarray(meas_track, jnp.int32),
        meas_uv=jnp.asarray(uv, jnp.float32),
        meas_mask=jnp.ones(len(meas_cam)),
    )
    s = pairwise_view_scores(sc)
    assert s[0, 2] > s[0, 1]  # wide baseline beats coincident pair
    np.testing.assert_allclose(s, s.T, atol=1e-9)
    src = select_source_views(sc, num_views=2)
    assert src[0, 0] == 2
