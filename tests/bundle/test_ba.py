"""Bundle adjustment tests: synthetic scenes with exact GT, noise injected
into cameras/points, LM must recover GT up to gauge (reference strategy:
tests/bundle on real tiny problems, no mocks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.geometry import alignment, cameras, lie


def make_ba_problem(rng, n_cams=6, n_tracks=60, pixel_noise=0.5):
    """Cameras on an arc viewing a point cloud; full visibility."""
    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1))
    angles = np.linspace(-0.5, 0.5, n_cams)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([8 * np.sin(a), 0.5 * np.sin(2 * a), -8 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32))
        wti.append(c)
    wRi = np.stack(wRi); wti = np.stack(wti)
    X = rng.uniform(-2, 2, size=(n_tracks, 3)).astype(np.float32)

    uv, depth = cameras.project_bundler(
        jnp.asarray(wRi)[:, None], jnp.asarray(wti)[:, None],
        jnp.asarray(cal)[:, None], jnp.asarray(X)[None],
    )
    uv = np.asarray(uv) + pixel_noise * rng.normal(size=uv.shape).astype(np.float32)
    assert np.all(np.asarray(depth) > 0)

    tracks = [
        [(i, uv[i, j]) for i in range(n_cams)] for j in range(n_tracks)
    ]
    sc = scene_mod.make_scene(wRi, wti, cal, tracks)
    sc = dataclasses.replace(sc, points=sc.points.at[:n_tracks].set(jnp.asarray(X)))
    return sc, (wRi, wti, X)


def perturb(rng, sc, rot_deg=3.0, trans=0.1, pt=0.1, keep_first=True):
    n = sc.num_cameras_padded
    dw = rng.normal(size=(n, 3)).astype(np.float32)
    dw = dw / np.linalg.norm(dw, axis=-1, keepdims=True) * np.deg2rad(rot_deg)
    dt = rng.normal(size=(n, 3)).astype(np.float32) * trans
    if keep_first:
        dw[0] = 0; dt[0] = 0
    R = jnp.asarray(np.stack([np.asarray(lie.so3_exp(jnp.asarray(w))) for w in dw])) @ sc.wRi
    t = sc.wti + jnp.asarray(dt)
    pts = sc.points + jnp.asarray(rng.normal(size=sc.points.shape).astype(np.float32) * pt)
    return dataclasses.replace(sc, wRi=R, wti=t, points=pts)


def test_ba_recovers_gt(rng):
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, pixel_noise=0.0)
    sc0 = perturb(rng, sc_gt)
    cost_before = float(ba.robust_cost(sc0, 1.345))
    result = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=30))
    cost_after = float(result.final_cost)
    assert cost_after < 1e-2 * cost_before
    err, _ = result.scene.reprojection_errors()
    live = np.asarray(result.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 0.05  # noiseless: ~0
    # Poses match GT after Sim(3) alignment.
    assert alignment.compare_global_poses(
        result.scene.wRi, result.scene.wti, jnp.asarray(wRi), jnp.asarray(wti),
        rot_err_thresh_deg=0.2, trans_err_atol=0.02, trans_err_rtol=0.02,
    )


def test_ba_noisy_converges(rng):
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, pixel_noise=0.5)
    sc0 = perturb(rng, sc_gt, rot_deg=2.0, trans=0.08, pt=0.08)
    result = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=30))
    err, _ = result.scene.reprojection_errors()
    live = np.asarray(result.scene.meas_mask) > 0
    mean_err = float(np.asarray(err)[live].mean())
    assert mean_err < 0.8  # ~ noise level
    assert alignment.compare_global_poses(
        result.scene.wRi, result.scene.wti, jnp.asarray(wRi), jnp.asarray(wti),
        rot_err_thresh_deg=1.0, trans_err_atol=0.1, trans_err_rtol=0.05,
    )


def test_ba_robust_to_outliers(rng):
    """Huber loss: a few gross outlier measurements must not wreck the solve."""
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, pixel_noise=0.3)
    uv = np.asarray(sc_gt.meas_uv).copy()
    live = np.nonzero(np.asarray(sc_gt.meas_mask) > 0)[0]
    bad = rng.choice(live, size=len(live) // 20, replace=False)
    uv[bad] += rng.uniform(30, 80, size=(len(bad), 2)).astype(np.float32)
    sc = dataclasses.replace(sc_gt, meas_uv=jnp.asarray(uv))
    sc0 = perturb(rng, sc, rot_deg=1.5, trans=0.05, pt=0.05)
    result = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=30))
    assert alignment.compare_global_poses(
        result.scene.wRi, result.scene.wti, jnp.asarray(wRi), jnp.asarray(wti),
        rot_err_thresh_deg=1.0, trans_err_atol=0.1, trans_err_rtol=0.1,
    )


def test_ba_with_filtering_stages(rng):
    sc_gt, _ = make_ba_problem(rng, pixel_noise=0.3)
    # inject outliers
    uv = np.asarray(sc_gt.meas_uv).copy()
    live = np.nonzero(np.asarray(sc_gt.meas_mask) > 0)[0]
    bad = rng.choice(live, size=len(live) // 10, replace=False)
    uv[bad] += 50.0
    sc = dataclasses.replace(sc_gt, meas_uv=jnp.asarray(uv))
    sc0 = perturb(rng, sc, rot_deg=1.0, trans=0.05, pt=0.05)
    final, stats = ba.run_ba_with_filtering(sc0, (10.0, 5.0, 3.0))
    assert len(stats) == 3
    # Outlier measurements got filtered.
    assert final.num_measurements() <= sc0.num_measurements() - len(bad) // 2
    err, _ = final.reprojection_errors()
    live_f = np.asarray(final.meas_mask) > 0
    assert float(np.asarray(err)[live_f].mean()) < 1.0


def test_ba_masked_padding_inert(rng):
    """Garbage in padded measurement slots must not affect the optimum."""
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=30, pixel_noise=0.2)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.03, pt=0.03)
    r1 = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=10))
    uv_garbage = sc0.meas_uv.at[sc0.num_measurements():].set(12345.0)
    sc0g = dataclasses.replace(sc0, meas_uv=uv_garbage)
    r2 = ba.lm_optimize(sc0g, ba.BAConfig(max_iterations=10))
    np.testing.assert_allclose(
        np.asarray(r1.scene.wti), np.asarray(r2.scene.wti), atol=1e-5
    )


def test_shared_calibration(rng):
    """share_calibration recovers ONE (f, k1, k2) for all cameras even when
    the initial guess is off by 5%."""
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, n_cams=5, n_tracks=50, pixel_noise=0.2)
    bad_cal = np.asarray(sc_gt.cal).copy()
    bad_cal[:, 0] *= 1.05  # focal off 5%
    sc0 = dataclasses.replace(sc_gt, cal=jnp.asarray(bad_cal))
    sc0 = perturb(rng, sc0, rot_deg=0.5, trans=0.02, pt=0.03)
    result = ba.lm_optimize(
        sc0, ba.BAConfig(max_iterations=40, share_calibration=True)
    )
    cal_f = np.asarray(result.scene.cal)
    # All cameras share the same calibration after optimization.
    assert np.allclose(cal_f, cal_f[0:1], atol=1e-5)
    # Fit reaches the noise floor (exact focal is not identifiable here —
    # the focal/depth ambiguity lets BA compensate a few % of f with scene
    # scale; what matters is one consistent calibration + a good fit).
    err, _ = result.scene.reprojection_errors()
    live = np.asarray(result.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 0.5
    assert abs(cal_f[0, 0] - 525.0) < 30.0  # did not diverge


def test_analytic_jacobians_match_autodiff(rng):
    """The closed-form blocks must equal 12-tangent jacfwd to f32 precision."""
    sc_gt, _ = make_ba_problem(rng, n_cams=3, n_tracks=10, pixel_noise=0.4)
    sc = perturb(rng, sc_gt, 1.0, 0.05, 0.05)
    wRi = sc.wRi[sc.meas_cam]
    wti = sc.wti[sc.meas_cam]
    cal = sc.cal[sc.meas_cam]
    X = sc.points[sc.meas_track]
    uv = sc.meas_uv
    r_a, Jc_a, Jp_a = ba._analytic_blocks(wRi, wti, cal, X, uv)
    zc = jnp.zeros((uv.shape[0], ba.CAM_DIM))
    zp = jnp.zeros((uv.shape[0], ba.PT_DIM))
    r_d = jax.vmap(ba._residual_one)(zc, zp, wRi, wti, cal, X, uv)
    Jc_d, Jp_d = jax.vmap(ba._jac_one)(zc, zp, wRi, wti, cal, X, uv)
    live = np.asarray(sc.meas_mask) > 0
    np.testing.assert_allclose(np.asarray(r_a)[live], np.asarray(r_d)[live], atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jc_a)[live], np.asarray(Jc_d)[live], rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Jp_a)[live], np.asarray(Jp_d)[live], rtol=1e-3, atol=1e-2)


def make_ragged_problem(rng, n_cams=8, n_tracks=40, pixel_noise=0.3):
    """Variable-length tracks + padded scene arrays (bucketing stress)."""
    sc_full, (wRi, wti, X) = make_ba_problem(rng, n_cams=n_cams, n_tracks=n_tracks,
                                             pixel_noise=pixel_noise)
    uv, _ = cameras.project_bundler(
        jnp.asarray(wRi)[:, None], jnp.asarray(wti)[:, None],
        jnp.asarray(np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1)))[:, None],
        jnp.asarray(X)[None],
    )
    uv = np.asarray(uv) + pixel_noise * rng.normal(size=uv.shape).astype(np.float32)
    tracks = []
    for j in range(n_tracks):
        length = int(rng.integers(2, n_cams + 1))
        cams = rng.choice(n_cams, size=length, replace=False)
        tracks.append([(int(i), uv[i, j]) for i in sorted(cams)])
    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1))
    sc = scene_mod.make_scene(wRi, wti, cal, tracks, pad_tracks_to=64, pad_meas_to=512)
    pts = np.zeros((64, 3), np.float32)
    pts[:n_tracks] = X
    sc = dataclasses.replace(sc, points=jnp.asarray(pts))
    return sc


def test_bucketed_schur_matches_flat(rng):
    """The scatter-free bucketed dense Schur path must produce the same LM
    trajectory as the scatter-grid path (same damping, same accepts)."""
    sc = make_ragged_problem(rng)
    sc_p = perturb(np.random.default_rng(3), sc, rot_deg=2.0, trans=0.08, pt=0.08)
    L = ba.auto_bucket_l(sc_p)
    res_flat = ba.lm_optimize(sc_p, ba.BAConfig(max_iterations=10))
    res_bkt = ba.lm_optimize(
        sc_p, ba.BAConfig(max_iterations=10, bucket_l=L, schur_bf16=False)
    )
    assert int(res_bkt.iterations) >= 1
    f_flat, f_bkt = float(res_flat.final_cost), float(res_bkt.final_cost)
    assert abs(f_flat - f_bkt) < 1e-2 * max(f_flat, 1.0), (f_flat, f_bkt)
    np.testing.assert_allclose(
        np.asarray(res_bkt.scene.wti), np.asarray(res_flat.scene.wti), atol=1e-3
    )
    # Default bf16 coupling: same converged quality (cost within 1%).
    res_bf16 = ba.lm_optimize(sc_p, ba.BAConfig(max_iterations=10, bucket_l=L))
    assert float(res_bf16.final_cost) < 1.01 * f_flat + 1e-6


def test_bucketed_recovers_gt(rng):
    sc, (wRi, wti, X) = make_ba_problem(rng, pixel_noise=0.0)
    sc_p = perturb(np.random.default_rng(5), sc)
    res = ba.lm_optimize(
        sc_p, ba.BAConfig(max_iterations=25, bucket_l=ba.auto_bucket_l(sc_p))
    )
    err, _ = res.scene.reprojection_errors()
    m = res.scene.meas_mask > 0
    assert float(jnp.where(m, err, 0).sum() / m.sum()) < 0.05


def test_pcg_bucketed_matches_dense(rng, monkeypatch):
    """The scatter-free bucketed matrix-free PCG path (large-N solver) must
    converge to the dense-path quality. Forced by shrinking the dense-Schur
    camera guard so the small fixture routes through PCG."""
    sc = make_ragged_problem(rng)
    sc_p = perturb(np.random.default_rng(3), sc, rot_deg=2.0, trans=0.08, pt=0.08)
    L = ba.auto_bucket_l(sc_p)
    res_dense = ba.lm_optimize(
        sc_p, ba.BAConfig(max_iterations=12, bucket_l=L, schur_bf16=False)
    )
    monkeypatch.setattr(ba, "_DENSE_SCHUR_MAX_CAMERAS", 0)
    res_pcg = ba.lm_optimize(
        sc_p,
        ba.BAConfig(max_iterations=12, bucket_l=L, schur_bf16=False,
                    pcg_iterations=60, pcg_tol=1e-8),
    )
    f_dense, f_pcg = float(res_dense.final_cost), float(res_pcg.final_cost)
    assert f_pcg < float(res_pcg.initial_cost)
    assert f_pcg < 1.05 * f_dense + 1e-6, (f_dense, f_pcg)
    # Default bf16 routing still converges (inexact-Newton inner solve).
    res_bf16 = ba.lm_optimize(
        sc_p, ba.BAConfig(max_iterations=12, bucket_l=L, pcg_iterations=60)
    )
    assert float(res_bf16.final_cost) < 1.10 * f_dense + 1e-6


def test_auto_bucket_l(rng):
    sc = make_ragged_problem(rng)
    L = ba.auto_bucket_l(sc)
    counts = np.bincount(
        np.asarray(sc.meas_track)[np.asarray(sc.meas_mask) > 0],
        minlength=sc.num_tracks_padded,
    )
    assert L == counts.max()


def make_banded_problem(rng, n_cams=80, n_tracks=400, obs_per_track=6, pixel_noise=0.3):
    """Sequential-capture-style problem: each track sees a narrow consecutive
    camera window (the structure auto_band detects)."""
    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1))
    angles = np.linspace(-1.0, 1.0, n_cams)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([10 * np.sin(a), 0.0, -10 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32))
        wti.append(c)
    wRi = np.stack(wRi); wti = np.stack(wti)
    X = rng.uniform(-2, 2, size=(n_tracks, 3)).astype(np.float32)
    start = rng.integers(0, n_cams - obs_per_track, size=n_tracks)
    tracks = []
    for j in range(n_tracks):
        cams = np.arange(int(start[j]), int(start[j]) + obs_per_track)
        uv, _ = cameras.project_bundler(
            jnp.asarray(wRi[cams]), jnp.asarray(wti[cams]),
            jnp.asarray(cal[cams]), jnp.broadcast_to(jnp.asarray(X[j]), (obs_per_track, 3)),
        )
        uv = np.asarray(uv) + pixel_noise * rng.normal(size=uv.shape).astype(np.float32)
        tracks.append([(c, uv[k]) for k, c in enumerate(cams)])
    sc = scene_mod.make_scene(wRi, wti, cal, tracks)
    sc = dataclasses.replace(sc, points=sc.points.at[:n_tracks].set(jnp.asarray(X)))
    return sc


def test_banded_schur_matches_bucketed(rng):
    sc_gt = make_banded_problem(rng)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    L = ba.auto_bucket_l(sc0)
    band, plan = ba.auto_band(sc0)
    assert band is not None, "auto_band should detect the windowed structure"
    C_, B_, T2, Tb, K = band
    assert 4 * C_ <= sc0.num_cameras_padded

    # f32 everywhere for a tight comparison between the two formulations.
    cfg_bkt = ba.BAConfig(max_iterations=12, bucket_l=L, schur_bf16=False)
    cfg_band = cfg_bkt._replace(band=band)
    res_bkt = ba.lm_optimize(sc0, cfg_bkt)
    res_band = ba.lm_optimize(sc0, cfg_band, band_plan=plan)

    assert float(res_band.initial_cost) == pytest.approx(
        float(res_bkt.initial_cost), rel=1e-5
    )
    assert float(res_band.final_cost) == pytest.approx(
        float(res_bkt.final_cost), rel=1e-2
    )
    # Returned layout is the INPUT track layout (permutation undone).
    live = np.asarray(sc0.track_mask) > 0
    d = np.linalg.norm(
        np.asarray(res_band.scene.points)[live] - np.asarray(res_bkt.scene.points)[live],
        axis=-1,
    )
    # Individual points are only noise-floor determined (pixel noise 0.3);
    # the two formulations reach equal cost along slightly different LM
    # trajectories, so compare points loosely and costs tightly (above).
    assert float(d.max()) < 8e-2
    # Measurement arrays still reference the right tracks/cameras.
    errs, _ = res_band.scene.reprojection_errors()
    m = np.asarray(res_band.scene.meas_mask) > 0
    assert float(np.asarray(errs)[m].mean()) < 1.0


def test_banded_recovers_gt(rng):
    sc_gt = make_banded_problem(rng, pixel_noise=0.0)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    band, plan = ba.auto_band(sc0)
    assert band is not None
    cfg = ba.BAConfig(max_iterations=25, bucket_l=ba.auto_bucket_l(sc0), band=band)
    res = ba.lm_optimize(sc0, cfg, band_plan=plan)
    assert float(res.final_cost) < 1e-2 * float(res.initial_cost)
    err, _ = res.scene.reprojection_errors()
    live = np.asarray(res.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 0.05


def test_auto_band_rejects_unbanded(rng):
    # Full-visibility problem (every track sees every camera): no banding.
    sc, _ = make_ba_problem(rng, n_cams=64, n_tracks=80)
    band, plan = ba.auto_band(sc)
    assert band is None and plan is None


def test_banded_pcg_matches_dense_banded(rng, monkeypatch):
    """Large-N banded path (matrix-free window-local PCG) converges to the
    same solution as the dense banded Cholesky path."""
    sc_gt = make_banded_problem(rng, n_cams=96, n_tracks=480)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    L = ba.auto_bucket_l(sc0)
    band, plan = ba.auto_band(sc0)
    assert band is not None

    cfg = ba.BAConfig(
        max_iterations=15, bucket_l=L, band=band, schur_bf16=False,
        pcg_iterations=60, pcg_tol=1e-8,
    )
    res_dense = ba.lm_optimize(sc0, cfg, band_plan=plan)
    # Force the PCG branch by shrinking the dense-Cholesky camera budget.
    # The branch is chosen at TRACE time, so drop the jit cache to retrace.
    monkeypatch.setattr(ba, "_DENSE_SCHUR_MAX_CAMERAS", 8)
    ba.lm_optimize.clear_cache()
    res_pcg = ba.lm_optimize(sc0, cfg, band_plan=plan)
    ba.lm_optimize.clear_cache()  # don't leak PCG traces to later tests

    assert float(res_pcg.initial_cost) == pytest.approx(
        float(res_dense.initial_cost), rel=1e-5
    )
    assert float(res_pcg.final_cost) == pytest.approx(
        float(res_dense.final_cost), rel=2e-2
    )
    errs, _ = res_pcg.scene.reprojection_errors()
    m = np.asarray(res_pcg.scene.meas_mask) > 0
    assert float(np.asarray(errs)[m].mean()) < 1.0
