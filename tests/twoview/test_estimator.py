"""Two-view BA tests: noisy relative poses must be refined toward GT
(reference tests/test_two_view_estimator.py strategy)."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.twoview import estimator
from tests.geometry.test_epipolar import make_two_view_scene


def perturb_pose(rng, R, t, rot_deg, dir_deg):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(rot_deg)
    Rp = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32))) @ np.asarray(R)
    w2 = rng.normal(size=3)
    w2 = w2 / np.linalg.norm(w2) * np.deg2rad(dir_deg)
    tp = np.asarray(lie.so3_exp(jnp.asarray(w2, jnp.float32))) @ np.asarray(t)
    return jnp.asarray(Rp), jnp.asarray(tp / np.linalg.norm(tp))


def test_triangulate_two_view(rng):
    x1, x2, R, t = make_two_view_scene(rng, n_pts=50)
    X, z1, z2 = estimator.triangulate_two_view(R, t, x1, x2)
    assert np.all(np.asarray(z1) > 0)
    r1, r2, _, _ = estimator._residuals(R, t, X, x1, x2)
    assert float(jnp.max(jnp.linalg.norm(r1, axis=-1))) < 1e-4
    assert float(jnp.max(jnp.linalg.norm(r2, axis=-1))) < 1e-4


def test_two_view_ba_refines_pose(rng):
    P, N = 4, 120
    R0s, t0s, x1s, x2s, Rgt, tgt = [], [], [], [], [], []
    for _ in range(P):
        x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
        Rp, tp = perturb_pose(rng, R, t, rot_deg=2.0, dir_deg=5.0)
        R0s.append(Rp); t0s.append(tp); x1s.append(x1); x2s.append(x2)
        Rgt.append(R); tgt.append(t)
    res = estimator.two_view_ba_batched(
        jnp.stack(R0s), jnp.stack(t0s), jnp.stack(x1s), jnp.stack(x2s),
        jnp.ones((P, N)), jnp.full((P,), 2e-3),
    )
    for p in range(P):
        rot_err0 = float(jnp.degrees(lie.rotation_angular_distance(R0s[p], Rgt[p])))
        rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[p], Rgt[p])))
        assert rot_err < 0.3, (rot_err0, rot_err)
        dir_err = np.degrees(
            np.arccos(np.clip(float(jnp.dot(res.i2Ui1[p], jnp.asarray(tgt[p]))), -1, 1))
        )
        assert dir_err < 1.0
        assert float(res.inlier_mask[p].mean()) > 0.9


def test_two_view_ba_with_outliers(rng):
    N = 150
    x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
    x2 = np.asarray(x2).copy()
    bad = rng.choice(N, 30, replace=False)
    x2[bad] += 0.1
    Rp, tp = perturb_pose(rng, R, t, rot_deg=1.5, dir_deg=4.0)
    w = np.ones(N, np.float32)  # pretend RANSAC missed the outliers
    res = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1[None], jnp.asarray(x2)[None],
        jnp.asarray(w)[None], jnp.full((1,), 2e-3),
    )
    rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R)))
    assert rot_err < 0.5  # Huber keeps the outliers from wrecking it
    # Outliers excluded by the reprojection filter.
    assert np.asarray(res.inlier_mask[0])[bad].mean() < 0.2


def test_padding_inert(rng):
    N = 80
    x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
    Rp, tp = perturb_pose(rng, R, t, 2.0, 4.0)
    pad = 40
    x1p = jnp.concatenate([x1, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    x2p = jnp.concatenate([x2, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    w = jnp.concatenate([jnp.ones(N), jnp.zeros(pad)])
    res = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1p[None], x2p[None], w[None], jnp.full((1,), 2e-3)
    )
    res_ref = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1[None], x2[None], jnp.ones((1, N)), jnp.full((1,), 2e-3)
    )
    err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], res_ref.i2Ri1[0])))
    assert err < 0.05
    assert float(jnp.sum(res.inlier_mask[0, N:])) == 0.0


# ---------------------------------------------------------------------------
# Reference-grade sweeps (VERDICT r3 item 6): convergence basin, noise,
# outlier fraction, forward motion — mirrors the synthetic-sweep strategy of
# reference tests/test_two_view_estimator.py + verifier sweeps.
# ---------------------------------------------------------------------------


def test_convergence_basin_sweep(rng):
    """The LM refinement must converge from increasingly bad initializations
    (up to 10 deg rotation / 20 deg direction error) on clean data."""
    N = 150
    for rot0, dir0 in [(1.0, 2.0), (5.0, 10.0), (10.0, 20.0)]:
        x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=2e-4)
        Rp, tp = perturb_pose(rng, R, t, rot_deg=rot0, dir_deg=dir0)
        res = estimator.two_view_ba_batched(
            Rp[None], tp[None], x1[None], x2[None],
            jnp.ones((1, N)), jnp.full((1,), 2e-3), iterations=30,
        )
        rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R)))
        dir_err = np.degrees(np.arccos(np.clip(
            float(jnp.dot(res.i2Ui1[0], jnp.asarray(t))), -1, 1)))
        assert rot_err < 0.3, (rot0, dir0, rot_err)
        assert dir_err < 1.0, (rot0, dir0, dir_err)


def test_noise_accuracy_sweep(rng):
    """Refined pose accuracy must track the measurement noise level (no
    noise floor above the CRLB scale): 0.1px -> ~0.05 deg, 1px -> ~0.5 deg."""
    N = 200
    for noise, rot_tol, dir_tol in [(1e-4, 0.15, 0.5), (5e-4, 0.5, 1.5), (1e-3, 1.0, 3.5)]:
        errs_r, errs_d = [], []
        for _ in range(3):
            x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=noise)
            Rp, tp = perturb_pose(rng, R, t, rot_deg=2.0, dir_deg=5.0)
            res = estimator.two_view_ba_batched(
                Rp[None], tp[None], x1[None], x2[None],
                jnp.ones((1, N)), jnp.full((1,), max(2e-3, 4.0 * noise)),
            )
            errs_r.append(float(jnp.degrees(
                lie.rotation_angular_distance(res.i2Ri1[0], R))))
            errs_d.append(np.degrees(np.arccos(np.clip(
                float(jnp.dot(res.i2Ui1[0], jnp.asarray(t))), -1, 1))))
        assert np.median(errs_r) < rot_tol, (noise, errs_r)
        assert np.median(errs_d) < dir_tol, (noise, errs_d)


def test_outlier_fraction_sweep(rng):
    """Graduated robust kernels (Huber warmup -> Cauchy): the refinement
    must hold its accuracy with unflagged outlier fractions up to 30%."""
    N = 200
    for frac in (0.1, 0.2, 0.3):
        x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
        x2 = np.asarray(x2).copy()
        bad = rng.choice(N, int(N * frac), replace=False)
        x2[bad] += rng.uniform(0.05, 0.2, size=(len(bad), 2)) * rng.choice(
            [-1, 1], size=(len(bad), 2))
        Rp, tp = perturb_pose(rng, R, t, rot_deg=2.0, dir_deg=4.0)
        res = estimator.two_view_ba_batched(
            Rp[None], tp[None], x1[None], jnp.asarray(x2)[None],
            jnp.ones((1, N)), jnp.full((1,), 2e-3),
        )
        rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R)))
        assert rot_err < 0.8, (frac, rot_err)
        # The reprojection filter must exclude the planted outliers.
        assert np.asarray(res.inlier_mask[0])[bad].mean() < 0.2, frac


def test_forward_motion_refinement(rng):
    """Near-forward motion: epipole in the image, weakest geometry for the
    direction — refinement must still improve a perturbed initialization."""
    N = 150
    w = rng.uniform(-0.2, 0.2, size=3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.04, 0.02, 1.0], np.float32)
    t /= np.linalg.norm(t)
    X = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(4.0, 8.0, N)], -1).astype(np.float32)
    X2 = X @ R.T + t
    x1 = jnp.asarray(X[:, :2] / X[:, 2:] + 2e-4 * rng.normal(size=(N, 2)), jnp.float32)
    x2 = jnp.asarray(X2[:, :2] / X2[:, 2:] + 2e-4 * rng.normal(size=(N, 2)), jnp.float32)
    Rp, tp = perturb_pose(rng, jnp.asarray(R), jnp.asarray(t), 2.0, 8.0)
    res = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1[None], x2[None],
        jnp.ones((1, N)), jnp.full((1,), 2e-3), iterations=30,
    )
    rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], jnp.asarray(R))))
    dir_err = np.degrees(np.arccos(np.clip(
        float(jnp.dot(res.i2Ui1[0], jnp.asarray(t))), -1, 1)))
    dir_err0 = np.degrees(np.arccos(np.clip(float(jnp.dot(tp, jnp.asarray(t))), -1, 1)))
    assert rot_err < 0.3
    assert dir_err < dir_err0 * 0.5  # at least halves the initial error


def test_ransac_to_ba_end_to_end_accuracy(rng):
    """RANSAC verify -> 2-view BA, chained (the pipeline's actual two-view
    path): final accuracy must beat RANSAC's own output on noisy data."""
    import jax as _jax
    from gtsfm_tpu.ops import ransac as _ransac

    N = 300
    x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=5e-4)
    x2c = np.asarray(x2).copy()
    bad = rng.choice(N, 90, replace=False)
    x2c[bad] = rng.uniform(-0.6, 0.6, size=(90, 2))
    v = _ransac.verify_essential_batched(
        _jax.random.PRNGKey(0), x1[None], jnp.asarray(x2c)[None],
        jnp.ones((1, N)), threshold=4e-3, num_hypotheses=512,
    )
    assert bool(v.success[0])
    res = estimator.two_view_ba_batched(
        v.i2Ri1, v.i2Ui1, x1[None], jnp.asarray(x2c)[None],
        v.inlier_mask, jnp.full((1,), 2e-3),
    )
    rot_ransac = float(jnp.degrees(lie.rotation_angular_distance(v.i2Ri1[0], R)))
    rot_ba = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R)))
    assert rot_ba < 0.5
    assert rot_ba <= rot_ransac + 0.05  # BA must not degrade the verify pose
