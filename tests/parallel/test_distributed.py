"""Multi-device SPMD tests on the virtual 8-device CPU mesh (the TPU analog
of the reference's LocalCluster stand-in, SURVEY.md section 4.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.parallel import distributed
from tests.bundle.test_ba import make_ba_problem, perturb
from tests.geometry.test_epipolar import make_two_view_scene
from gtsfm_tpu.geometry import lie


def test_mesh_has_8_devices():
    mesh = distributed.make_mesh()
    assert mesh.devices.size == 8


def test_pair_sharded_verify(rng):
    mesh = distributed.make_mesh()
    scenes = [make_two_view_scene(rng, n_pts=64, noise=3e-4) for _ in range(8)]
    x1 = jnp.stack([s[0] for s in scenes])
    x2 = jnp.stack([s[1] for s in scenes])
    res = distributed.pair_sharded_verify(
        mesh, jax.random.PRNGKey(0), x1, x2, jnp.ones((8, 64)), 4e-3, num_hypotheses=128
    )
    for p in range(8):
        assert bool(res.success[p])
        err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[p], scenes[p][2])))
        assert err < 1.5


def test_distributed_ba_step_matches_single_device(rng):
    """The psum-reduced GN step must equal the single-device step."""
    mesh = distributed.make_mesh()
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.3)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    assert sc0.num_measurements_padded % 8 == 0

    cfg = ba.BAConfig()
    stepped = distributed.distributed_ba_gn_step(mesh, sc0, lam=1e-4, cfg=cfg)

    #

    # Single-device equivalent: one _schur_solve with the same lambda.
    N = sc0.num_cameras_padded
    first_live = jnp.argmax(sc0.camera_mask > 0)
    cam_fixed = jax.nn.one_hot(first_live, N, dtype=sc0.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * sc0.camera_mask
    r, Jc, Jp, _ = ba._build_blocks(sc0, cfg, cam_free)
    dc, dp = ba._schur_solve(r, Jc, Jp, sc0, jnp.asarray(1e-4), cfg)
    R, t, cal = ba._apply_camera_delta(sc0.wRi, sc0.wti, sc0.cal, dc)

    # atol covers f32 accumulation-order differences between the psum-sharded
    # and single-device segment sums.
    np.testing.assert_allclose(np.asarray(stepped.wti), np.asarray(t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stepped.points), np.asarray(sc0.points + dp), rtol=1e-3, atol=1e-4
    )


def test_distributed_ba_step_reduces_cost(rng):
    mesh = distributed.make_mesh()
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.2)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    c0 = float(ba.robust_cost(sc0, 1.345))
    sc1 = distributed.distributed_ba_gn_step(mesh, sc0)
    c1 = float(ba.robust_cost(sc1, 1.345))
    assert c1 < 0.5 * c0


def test_distributed_lm_converges(rng):
    """Full distributed LM loop must reach the same quality as single-device."""
    from gtsfm_tpu.geometry import alignment

    mesh = distributed.make_mesh()
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.3)
    sc0 = perturb(rng, sc_gt, rot_deg=2.0, trans=0.08, pt=0.08)
    final, stats = distributed.distributed_lm_optimize(
        mesh, sc0, ba.BAConfig(max_iterations=25)
    )
    assert stats["final_cost"] < 0.05 * stats["initial_cost"]
    assert alignment.compare_global_poses(
        final.wRi, final.wti, jnp.asarray(wRi), jnp.asarray(wti),
        rot_err_thresh_deg=1.0, trans_err_atol=0.1, trans_err_rtol=0.05,
    )


def test_tracksharded_step_matches_bucketed_single_device(rng):
    """Track-sharded bucketed GN step == single-device bucketed dense solve."""
    mesh = distributed.make_mesh()
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.3)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    assert sc0.num_tracks_padded % 8 == 0
    L = ba.auto_bucket_l(sc0)
    cfg = ba.BAConfig(schur_bf16=False)

    stepped = distributed.distributed_ba_gn_step_tracksharded(
        mesh, sc0, L, lam=1e-4, cfg=cfg
    )

    # Single-device bucketed equivalent.
    N = sc0.num_cameras_padded
    T = sc0.num_tracks_padded
    first_live = jnp.argmax(sc0.camera_mask > 0)
    cam_fixed = jax.nn.one_hot(first_live, N, dtype=sc0.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * sc0.camera_mask
    sort_track = jnp.where(sc0.meas_mask > 0, sc0.meas_track, T)
    order = jnp.argsort(sort_track * N + sc0.meas_cam)
    sc_s = dataclasses.replace(
        sc0, meas_cam=sc0.meas_cam[order], meas_track=sc0.meas_track[order],
        meas_uv=sc0.meas_uv[order], meas_mask=sc0.meas_mask[order],
    )
    bucket = ba._make_bucket(sc_s, L)
    r, Jc, Jp, _ = ba._build_blocks_bucketed(sc_s, bucket, cfg, cam_free)
    dc, dp = ba._schur_solve_dense_bucketed(
        r, Jc, Jp, bucket, sc_s, jnp.asarray(1e-4), cfg
    )
    R, t, cal = ba._apply_camera_delta(sc_s.wRi, sc_s.wti, sc_s.cal, dc)
    np.testing.assert_allclose(np.asarray(stepped.wti), np.asarray(t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stepped.points), np.asarray(sc_s.points + dp), rtol=1e-3, atol=2e-4
    )


def test_distributed_lm_bucketed_converges(rng):
    mesh = distributed.make_mesh()
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.0)
    sc0 = perturb(rng, sc_gt, rot_deg=1.5, trans=0.08, pt=0.08)
    cfg = ba.BAConfig(max_iterations=15, bucket_l=ba.auto_bucket_l(sc0),
                      schur_bf16=False)
    sc1, stats = distributed.distributed_lm_optimize(mesh, sc0, cfg)
    err, _ = sc1.reprojection_errors()
    m = sc1.meas_mask > 0
    mean_err = float(jnp.where(m, err, 0).sum() / m.sum())
    assert mean_err < 0.1, (mean_err, stats)


def test_banded_distributed_lm_matches_single_device(rng):
    """Banded row-sharded distributed LM (window-block psum) reaches the
    single-device banded optimizer's solution quality."""
    from tests.bundle.test_ba import make_banded_problem

    mesh = distributed.make_mesh()
    sc_gt = make_banded_problem(rng, n_cams=96, n_tracks=480)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    L = ba.auto_bucket_l(sc0)
    band, plan = ba.auto_band(sc0, tb=16)
    assert band is not None

    cfg = ba.BAConfig(
        max_iterations=12, bucket_l=L, band=band, schur_bf16=False,
        pcg_iterations=60, pcg_tol=1e-8,
    )
    sc_dist, stats = distributed.distributed_lm_optimize(
        mesh, sc0, cfg, band_plan=plan
    )
    res_single = ba.lm_optimize(sc0, cfg, band_plan=plan)

    assert stats["accepted"] >= 1
    assert stats["final_cost"] < 0.5 * stats["initial_cost"]
    assert stats["final_cost"] == pytest.approx(
        float(res_single.final_cost), rel=5e-2
    )
    # Track layout restored: reprojection on the returned scene is sane.
    errs, _ = sc_dist.reprojection_errors()
    m = np.asarray(sc_dist.meas_mask) > 0
    assert float(np.asarray(errs)[m].mean()) < 1.0


def test_distributed_priors_banded(rng):
    """Between-factor priors through the DISTRIBUTED banded row-sharded step:
    replicated fold into the reduced solve; relative poses honored."""
    from tests.bundle.test_ba import make_banded_problem
    from tests.bundle.test_ba_priors import _sequential_priors

    mesh = distributed.make_mesh()
    sc_gt = make_banded_problem(rng, n_cams=96, n_tracks=480)
    wRi, wti = np.asarray(sc_gt.wRi), np.asarray(sc_gt.wti)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    edges, priors = _sequential_priors(wRi, wti, 96, weight=50.0, stride=7)

    band, plan = ba.auto_band(sc0, tb=16)
    assert band is not None
    cfg = ba.BAConfig(
        max_iterations=12, bucket_l=ba.auto_bucket_l(sc0), band=band,
        schur_bf16=False, pcg_iterations=80, pcg_tol=1e-8,
    )
    sc_dist, stats = distributed.distributed_lm_optimize(
        mesh, sc0, cfg, band_plan=plan, priors=priors
    )
    res_single = ba.lm_optimize(sc0, cfg, priors=priors, band_plan=plan)
    assert stats["final_cost"] == pytest.approx(
        float(res_single.final_cost), rel=5e-2
    )
    Rf, tf = np.asarray(sc_dist.wRi), np.asarray(sc_dist.wti)
    for k, (a, b) in enumerate(edges):
        aRb_f = Rf[a].T @ Rf[b]
        err = float(jnp.degrees(lie.rotation_angular_distance(
            jnp.asarray(aRb_f), priors.aRb[k])))
        assert err < 0.3


def test_track_sharded_triangulate_matches_single_device(rng):
    """Track-sharded robust triangulation (data-association fan-out,
    reference data_assoc.py as Dask tasks): sharded result must equal the
    single-device triangulation and recover GT points."""
    from gtsfm_tpu.geometry import cameras
    from gtsfm_tpu.multiview import data_association as da

    mesh = distributed.make_mesh()
    sc, _ = make_ba_problem(rng, n_cams=6, n_tracks=16)
    T, L = 32, 4
    X = rng.uniform(-2, 2, size=(T, 3)).astype(np.float32)
    cam_idx = jnp.asarray(rng.integers(0, 6, size=(T, L)), jnp.int32)
    uv, _ = cameras.project_bundler(
        sc.wRi[cam_idx], sc.wti[cam_idx], sc.cal[cam_idx],
        jnp.asarray(X)[:, None, :],
    )
    mask = jnp.ones((T, L))
    out = distributed.track_sharded_triangulate(
        mesh, sc.wRi, sc.wti, sc.cal, cam_idx, uv, mask, reproj_thresh_px=5.0
    )
    ref = da.triangulate_tracks_robust(
        sc.wRi, sc.wti, sc.cal, cam_idx, uv, mask, reproj_thresh_px=5.0
    )
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(ref.points),
                               atol=1e-4)
    assert float(jnp.abs(out.points - jnp.asarray(X)).max()) < 1e-2
