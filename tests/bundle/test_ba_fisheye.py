"""Native Cal3Fisheye bundle adjustment (reference optimizes fisheye cameras
inside BA through GeneralSFMFactor2Cal3Fisheye, bundle_adjustment.py:106 +
common/types.py:9-13 — round 1 only supported one-time undistortion to a
virtual pinhole; this is the native path: 9-wide calibration dispatches the
equidistant projection + autodiff Jacobians through every solver)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.geometry import cameras, lie


def make_fisheye_problem(rng, n_cams=5, n_tracks=40, pixel_noise=0.0,
                         k1=-0.02, k2=0.005):
    f = 400.0
    cal9 = np.tile(
        np.asarray([f, f, 0.0, 320.0, 240.0, k1, k2, 0.0, 0.0], np.float32),
        (n_cams, 1),
    )
    wRi, wti = [], []
    for i in range(n_cams):
        ax = rng.normal(size=3) * 0.05
        wRi.append(np.asarray(lie.so3_exp(jnp.asarray(ax)), np.float32))
        wti.append(np.asarray([0.4 * i, 0.1 * rng.normal(), 0.0], np.float32))
    wRi, wti = np.stack(wRi), np.stack(wti)
    # Wide-FOV point spread (angles to ~50 deg): large theta separates the
    # focal from the equidistant distortion coefficients, making (f, k1, k2)
    # observable — a narrow-FOV cloud lets them trade off freely.
    X = np.stack(
        [rng.uniform(-5, 7, n_tracks), rng.uniform(-4, 4, n_tracks),
         rng.uniform(3, 9, n_tracks)], -1
    ).astype(np.float32)
    tracks = []
    for j in range(n_tracks):
        tr = []
        for i in range(n_cams):
            uv, d = cameras.project_fisheye(
                jnp.asarray(wRi[i]), jnp.asarray(wti[i]), jnp.asarray(cal9[i]),
                jnp.asarray(X[j]),
            )
            uv = np.asarray(uv) + pixel_noise * rng.normal(size=2)
            tr.append((i, uv.astype(np.float32)))
        tracks.append(tr)
    sc = scene_mod.make_scene(wRi, wti, cal9, tracks)
    sc = dataclasses.replace(sc, points=sc.points.at[:n_tracks].set(jnp.asarray(X)))
    return sc, (wRi, wti, X)


def test_fisheye_projection_roundtrip(rng):
    cal9 = jnp.asarray([400.0, 400.0, 0.0, 320.0, 240.0, -0.02, 0.005, 0.0, 0.0])
    X = jnp.asarray(rng.uniform(-1, 1, (20, 3)) + np.asarray([0, 0, 5.0]), jnp.float32)
    uv, depth = cameras.project_fisheye(jnp.eye(3), jnp.zeros(3), cal9, X)
    assert np.all(np.asarray(depth) > 0)
    # calibrate inverts uncalibrate.
    pn = cameras.fisheye_calibrate(cal9, uv)
    np.testing.assert_allclose(
        np.asarray(pn), np.asarray(X[:, :2] / X[:, 2:3]), atol=1e-4
    )


def test_fisheye_scene_reprojection_zero(rng):
    sc, _ = make_fisheye_problem(rng)
    err, depth = sc.reprojection_errors()
    live = np.asarray(sc.meas_mask) > 0
    assert float(np.asarray(err)[live].max()) < 1e-2


def test_fisheye_ba_recovers_poses(rng):
    from tests.bundle.test_ba import perturb

    sc_gt, (wRi, wti, X) = make_fisheye_problem(rng, pixel_noise=0.2)
    sc0 = perturb(rng, sc_gt, rot_deg=1.5, trans=0.05, pt=0.05)
    res = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=25))
    err, _ = res.scene.reprojection_errors()
    live = np.asarray(res.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 0.5
    # Calibration untouched when frozen.
    np.testing.assert_array_equal(np.asarray(res.scene.cal), np.asarray(sc0.cal))


def test_fisheye_ba_refines_distortion(rng):
    """optimize_calibration must pull perturbed (f, k1, k2) of the
    EQUIDISTANT model back toward truth — the capability the virtual-pinhole
    round-1 path could not provide."""
    from tests.bundle.test_ba import perturb

    sc_gt, _ = make_fisheye_problem(rng, n_cams=6, n_tracks=60)
    bad_cal = np.asarray(sc_gt.cal).copy()
    bad_cal[:, 0] *= 1.02  # fx off by 2%
    bad_cal[:, 1] *= 1.02
    bad_cal[:, 5] += 0.01  # k1 off
    sc0 = dataclasses.replace(sc_gt, cal=jnp.asarray(bad_cal))
    sc0 = perturb(rng, sc0, rot_deg=0.3, trans=0.01, pt=0.01)

    cost0 = float(ba.robust_cost(sc0, 1.345))
    res = ba.lm_optimize(
        sc0, ba.BAConfig(max_iterations=40, optimize_calibration=True)
    )
    err, _ = res.scene.reprojection_errors()
    live = np.asarray(res.scene.meas_mask) > 0
    assert float(ba.robust_cost(res.scene, 1.345)) < 0.05 * cost0
    assert float(np.asarray(err)[live].mean()) < 0.3
    cal_f = np.asarray(res.scene.cal)
    # Focal pulled back toward 400 (within 1% from the 2% perturbation).
    assert np.abs(cal_f[:, 0] - 400.0).max() / 400.0 < 0.01


def test_fisheye_banded_path(rng):
    """9-wide calibration through the BANDED solver (routed state tables have
    dynamic calibration width)."""
    sc_gt, _ = make_fisheye_problem(rng, n_cams=70, n_tracks=300)
    # Restrict each track to a narrow camera window to create band structure.
    # Rebuild: tracks see cameras [s, s+5).
    import numpy as _np

    from tests.bundle.test_ba import perturb

    f = 400.0
    cal9 = np.tile(
        np.asarray([f, f, 0.0, 320.0, 240.0, -0.02, 0.005, 0.0, 0.0], np.float32),
        (70, 1),
    )
    wRi = np.tile(np.eye(3, dtype=np.float32), (70, 1, 1))
    wti = np.stack([np.asarray([0.3 * i, 0.0, 0.0], np.float32) for i in range(70)])
    X = np.stack(
        [rng.uniform(0, 21, 300), rng.uniform(-1, 1, 300), rng.uniform(4, 8, 300)], -1
    ).astype(np.float32)
    start = rng.integers(0, 65, 300)
    tracks = []
    for j in range(300):
        cams = range(int(start[j]), int(start[j]) + 5)
        tr = []
        for i in cams:
            uv, _ = cameras.project_fisheye(
                jnp.asarray(wRi[i]), jnp.asarray(wti[i]), jnp.asarray(cal9[i]),
                jnp.asarray(X[j]),
            )
            tr.append((i, np.asarray(uv, np.float32)))
        tracks.append(tr)
    sc_gt = scene_mod.make_scene(wRi, wti, cal9, tracks)
    sc_gt = dataclasses.replace(sc_gt, points=sc_gt.points.at[:300].set(jnp.asarray(X)))
    sc0 = perturb(rng, sc_gt, rot_deg=0.5, trans=0.03, pt=0.03)
    band, plan = ba.auto_band(sc0, min_cameras=32)
    assert band is not None
    cfg = ba.BAConfig(
        max_iterations=15, bucket_l=ba.auto_bucket_l(sc0), band=band,
        schur_bf16=False,
    )
    res = ba.lm_optimize(sc0, cfg, band_plan=plan)
    err, _ = res.scene.reprojection_errors()
    live = np.asarray(res.scene.meas_mask) > 0
    assert float(np.asarray(err)[live].mean()) < 0.3
