import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import epipolar
from gtsfm_tpu.ops import verifiers
from tests.geometry.test_epipolar import make_two_view_scene


def to_pixels(x, f=800.0, c=500.0):
    return x * f + c


def test_fundamental_ransac(rng):
    x1, x2, R, t = make_two_view_scene(rng, n_pts=150, noise=3e-4)
    uv1 = to_pixels(x1)
    uv2 = to_pixels(x2)
    uv2_bad = np.asarray(uv2).copy()
    bad = rng.choice(150, 40, replace=False)
    uv2_bad[bad] += rng.uniform(40, 150, size=(40, 2))
    res = verifiers.verify_fundamental_batched(
        jax.random.PRNGKey(0), uv1[None], jnp.asarray(uv2_bad)[None],
        jnp.ones((1, 150)), 3.0, num_hypotheses=256,
    )
    assert bool(res.success[0])
    inl = np.asarray(res.inlier_mask[0])
    assert inl[bad].mean() < 0.15
    assert inl.sum() > 90
    # F consistent with GT epipolar geometry on the clean points.
    good = np.setdiff1d(np.arange(150), bad)
    d = epipolar.sampson_distance_sq(res.F[0], uv1[good], uv2[good])
    assert float(jnp.sqrt(d).mean()) < 1.0


def test_lmeds_essential(rng):
    """LMedS (threshold-free) rejects 30% outliers and recovers the GT pose."""
    from gtsfm_tpu.geometry import lie

    x1, x2, R, t = make_two_view_scene(rng, n_pts=200, noise=2e-4)
    x2_bad = np.asarray(x2).copy()
    bad = rng.choice(200, 60, replace=False)
    x2_bad[bad] += rng.uniform(0.05, 0.3, size=(60, 2))
    res = verifiers.verify_essential_lmeds_batched(
        jax.random.PRNGKey(0), x1[None], jnp.asarray(x2_bad)[None],
        jnp.ones((1, 200)), num_hypotheses=512,
    )
    assert bool(res.success[0])
    inl = np.asarray(res.inlier_mask[0])
    assert inl[bad].mean() < 0.15
    good = np.setdiff1d(np.arange(200), bad)
    assert inl[good].mean() > 0.8
    r_err = np.degrees(
        float(jnp.linalg.norm(lie.so3_log(jnp.asarray(R.T) @ res.i2Ri1[0])))
    )
    t_err = np.degrees(
        np.arccos(np.clip(abs(float(res.i2Ui1[0] @ (t / np.linalg.norm(t)))), 0, 1))
    )
    assert r_err < 1.0 and t_err < 2.0


def test_lmeds_fundamental(rng):
    x1, x2, R, t = make_two_view_scene(rng, n_pts=150, noise=3e-4)
    uv1 = to_pixels(x1)
    uv2_bad = np.asarray(to_pixels(x2)).copy()
    bad = rng.choice(150, 40, replace=False)
    uv2_bad[bad] += rng.uniform(40, 150, size=(40, 2))
    res = verifiers.verify_fundamental_lmeds_batched(
        jax.random.PRNGKey(0), uv1[None], jnp.asarray(uv2_bad)[None],
        jnp.ones((1, 150)), num_hypotheses=512,
    )
    assert bool(res.success[0])
    inl = np.asarray(res.inlier_mask[0])
    assert inl[bad].mean() < 0.2
    assert inl.sum() > 80


def test_homography_fit_exact(rng):
    H_gt = jnp.asarray(
        [[1.1, 0.05, 10.0], [-0.03, 0.95, -5.0], [1e-4, -2e-4, 1.0]], jnp.float32
    )
    x1 = jnp.asarray(rng.uniform(0, 500, size=(30, 2)), jnp.float32)
    p = epipolar.homogenize(x1) @ H_gt.T
    x2 = p[:, :2] / p[:, 2:3]
    H = verifiers.homography_from_four_point(x1, x2)
    err = verifiers.homography_transfer_error_sq(H, x1, x2)
    assert float(jnp.sqrt(err).max()) < 0.1


def test_gric_prefers_F_for_general_scene(rng):
    x1, x2, R, t = make_two_view_scene(rng, n_pts=200, noise=3e-4)
    uv1, uv2 = to_pixels(x1), to_pixels(x2)
    res_f = verifiers.verify_fundamental_batched(
        jax.random.PRNGKey(0), uv1[None], uv2[None], jnp.ones((1, 200)), 3.0,
        num_hypotheses=256,
    )
    g = verifiers.gric_select_batched(
        jax.random.PRNGKey(1), uv1[None], uv2[None], jnp.ones((1, 200)), res_f.F
    )
    assert bool(g.prefer_fundamental[0])


def _make_dominant_plane_scene(rng, n_plane=235, n_off=15, noise_px=0.3):
    """Two views of a dominant plane + a few off-plane points. Returns pixel
    correspondences, the off-plane index set, and the GT F."""
    from gtsfm_tpu.geometry import lie

    R = np.asarray(lie.so3_exp(jnp.asarray([0.04, -0.12, 0.03])))
    t = np.asarray([0.6, 0.15, 0.1], np.float32)
    Xp = np.stack([
        rng.uniform(-2, 2, n_plane), rng.uniform(-2, 2, n_plane),
        np.full(n_plane, 5.0),
    ], -1).astype(np.float32)
    Xo = np.stack([
        rng.uniform(-2, 2, n_off), rng.uniform(-2, 2, n_off),
        rng.uniform(2.5, 9.0, n_off),
    ], -1).astype(np.float32)
    X1 = np.concatenate([Xp, Xo])
    X2 = X1 @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    f, c = 800.0, 500.0
    uv1 = x1 * f + c + rng.normal(scale=noise_px, size=x1.shape)
    uv2 = x2 * f + c + rng.normal(scale=noise_px, size=x2.shape)
    K = np.asarray([[f, 0, c], [0, f, c], [0, 0, 1.0]], np.float32)
    E = np.asarray(lie.hat(jnp.asarray(t))) @ R
    Kinv = np.linalg.inv(K)
    F_gt = Kinv.T @ E @ Kinv
    off_idx = np.arange(n_plane, n_plane + n_off)
    return (
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        off_idx, jnp.asarray(F_gt, jnp.float32),
    )


def test_degensac_recovers_from_dominant_plane(rng):
    """94% of points on one plane: degensac must flag H-degeneracy and return
    an F consistent with the GT epipolar geometry on the OFF-plane points."""
    uv1, uv2, off_idx, F_gt = _make_dominant_plane_scene(rng)
    n = uv1.shape[0]
    res = verifiers.verify_fundamental_degensac_batched(
        jax.random.PRNGKey(3), uv1[None], uv2[None], jnp.ones((1, n)), 2.0,
        num_hypotheses=512,
    )
    assert bool(res.h_degenerate[0])
    assert bool(res.success[0])
    # The recovered F explains the off-plane points.
    d_off = epipolar.sampson_distance_sq(res.F[0], uv1[off_idx], uv2[off_idx])
    assert float(jnp.sqrt(d_off).mean()) < 2.0
    inl = np.asarray(res.inlier_mask[0])
    assert inl[off_idx].mean() > 0.7
    assert inl.mean() > 0.9


def test_degensac_general_scene_passthrough(rng):
    """Non-planar scene: no degeneracy flag, result matches plain RANSAC."""
    x1, x2, R, t = make_two_view_scene(rng, n_pts=150, noise=3e-4)
    uv1, uv2 = to_pixels(x1), to_pixels(x2)
    res = verifiers.verify_fundamental_degensac_batched(
        jax.random.PRNGKey(0), uv1[None], uv2[None], jnp.ones((1, 150)), 3.0,
        num_hypotheses=256,
    )
    assert not bool(res.h_degenerate[0])
    assert bool(res.success[0])
    d = epipolar.sampson_distance_sq(res.F[0], uv1, uv2)
    assert float(jnp.sqrt(d).mean()) < 1.0


def test_gric_prefers_H_for_planar_scene(rng):
    """All points on a plane: homography explains the data, F is degenerate."""
    from gtsfm_tpu.geometry import lie

    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    t = np.asarray([0.4, 0.1, 0.05])
    n_pts = 200
    # Points on plane z = 5 in frame 1.
    X1 = np.stack([
        np.random.default_rng(1).uniform(-2, 2, n_pts),
        np.random.default_rng(2).uniform(-2, 2, n_pts),
        np.full(n_pts, 5.0),
    ], -1).astype(np.float32)
    X2 = X1 @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    uv1, uv2 = to_pixels(jnp.asarray(x1)), to_pixels(jnp.asarray(x2))
    res_f = verifiers.verify_fundamental_batched(
        jax.random.PRNGKey(0), uv1[None], uv2[None], jnp.ones((1, n_pts)), 3.0,
        num_hypotheses=256,
    )
    g = verifiers.gric_select_batched(
        jax.random.PRNGKey(1), uv1[None], uv2[None], jnp.ones((1, n_pts)), res_f.F
    )
    assert not bool(g.prefer_fundamental[0])


def test_gric_three_way_e_vs_f_vs_h(rng):
    """The reference's GRIC verifier 'automatically checks E vs. F vs. H'
    (gric_verifier.py:64). Three configurations, three winners:
      1. general scene, CORRECT calibration -> CALIBRATED (E: same fit as
         F at a lower k penalty);
      2. general scene, WRONG calibration (E fitted on badly-normalized
         coords) -> UNCALIBRATED (F absorbs the unknown intrinsics);
      3. planar scene -> PLANAR_OR_PANORAMIC.
    """
    from gtsfm_tpu.geometry import lie
    from gtsfm_tpu.ops import ransac

    f, c = 800.0, 500.0
    n = 200

    # --- 1. general scene, correct calibration
    x1, x2, R, t = make_two_view_scene(rng, n_pts=n, noise=3e-4)
    uv1, uv2 = to_pixels(x1), to_pixels(x2)
    res_f = verifiers.verify_fundamental_batched(
        jax.random.PRNGKey(0), uv1[None], uv2[None], jnp.ones((1, n)), 3.0,
        num_hypotheses=256,
    )
    res_e = ransac.verify_essential_batched(
        jax.random.PRNGKey(1), x1[None], x2[None], jnp.ones((1, n)),
        threshold=4.0 / f, num_hypotheses=256,
    )
    E = lie.hat(res_e.i2Ui1) @ res_e.i2Ri1
    g = verifiers.gric_select_batched(
        jax.random.PRNGKey(2), uv1[None], uv2[None], jnp.ones((1, n)),
        res_f.F, E=E, x1n=x1[None], x2n=x2[None],
        focal=jnp.full((1,), f, jnp.float32),
    )
    assert bool(g.prefer_fundamental[0])
    assert int(g.config[0]) == verifiers.CONFIG_CALIBRATED
    assert float(g.gric_E[0]) < float(g.gric_F[0])

    # --- 2. same pixels, WRONG calibration (focal off 2.5x): the E fitted
    # on the badly normalized coordinates explains the data poorly.
    f_bad = f / 2.5
    x1_bad = (uv1 - c) / f_bad
    x2_bad = (uv2 - c) / f_bad
    res_e_bad = ransac.verify_essential_batched(
        jax.random.PRNGKey(3), x1_bad[None], x2_bad[None], jnp.ones((1, n)),
        threshold=4.0 / f_bad, num_hypotheses=256,
    )
    E_bad = lie.hat(res_e_bad.i2Ui1) @ res_e_bad.i2Ri1
    g2 = verifiers.gric_select_batched(
        jax.random.PRNGKey(4), uv1[None], uv2[None], jnp.ones((1, n)),
        res_f.F, E=E_bad, x1n=x1_bad[None], x2n=x2_bad[None],
        focal=jnp.full((1,), f_bad, jnp.float32),
    )
    assert int(g2.config[0]) == verifiers.CONFIG_UNCALIBRATED
    assert float(g2.gric_F[0]) < float(g2.gric_E[0])

    # --- 3. planar scene (all points on z=5): H wins over BOTH E and F.
    Rp = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    tp = np.asarray([0.4, 0.1, 0.05])
    X1 = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.full(n, 5.0),
    ], -1).astype(np.float32)
    X2 = X1 @ Rp.T + tp
    x1p = jnp.asarray(X1[:, :2] / X1[:, 2:3])
    x2p = jnp.asarray(X2[:, :2] / X2[:, 2:3])
    uv1p, uv2p = to_pixels(x1p), to_pixels(x2p)
    res_fp = verifiers.verify_fundamental_batched(
        jax.random.PRNGKey(5), uv1p[None], uv2p[None], jnp.ones((1, n)), 3.0,
        num_hypotheses=256,
    )
    res_ep = ransac.verify_essential_batched(
        jax.random.PRNGKey(6), x1p[None], x2p[None], jnp.ones((1, n)),
        threshold=4.0 / f, num_hypotheses=256,
    )
    Ep = lie.hat(res_ep.i2Ui1) @ res_ep.i2Ri1
    g3 = verifiers.gric_select_batched(
        jax.random.PRNGKey(7), uv1p[None], uv2p[None], jnp.ones((1, n)),
        res_fp.F, E=Ep, x1n=x1p[None], x2n=x2p[None],
        focal=jnp.full((1,), f, jnp.float32),
    )
    assert int(g3.config[0]) == verifiers.CONFIG_PLANAR_OR_PANORAMIC
    assert not bool(g3.prefer_fundamental[0])
