"""Between-factor (relative pose prior) BA tests — the rig/Hilti machinery
(reference rig_bundle_adjustment.py + _between_factors)."""

import dataclasses

import jax.numpy as jnp
import pytest
import numpy as np

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.geometry import lie
from tests.bundle.test_ba import make_ba_problem, perturb


def gt_relative(wRi, wti, a, b):
    aRb = wRi[a].T @ wRi[b]
    atb = wRi[a].T @ (wti[b] - wti[a])
    return aRb, atb


def test_priors_enforce_relative_pose(rng):
    """Strong between-factors must pull the solution to the measured
    relative poses even with few image measurements."""
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, n_cams=5, n_tracks=30, pixel_noise=0.3)
    sc0 = perturb(rng, sc_gt, rot_deg=2.0, trans=0.08, pt=0.08)

    edges = [(i, i + 1) for i in range(4)]
    aRb = np.stack([gt_relative(wRi, wti, a, b)[0] for a, b in edges])
    atb = np.stack([gt_relative(wRi, wti, a, b)[1] for a, b in edges])
    priors = ba.RelativePosePriors(
        edges_a=jnp.asarray([a for a, b in edges], jnp.int32),
        edges_b=jnp.asarray([b for a, b in edges], jnp.int32),
        aRb=jnp.asarray(aRb), atb=jnp.asarray(atb),
        weight=jnp.full(4, 100.0),
    )
    result = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=30), priors=priors)
    # Relative poses honored to high precision.
    Rf = np.asarray(result.scene.wRi)
    tf = np.asarray(result.scene.wti)
    for k, (a, b) in enumerate(edges):
        aRb_f, atb_f = gt_relative(Rf, tf, a, b)
        err = float(jnp.degrees(lie.rotation_angular_distance(
            jnp.asarray(aRb_f), jnp.asarray(aRb[k]))))
        assert err < 0.1
        np.testing.assert_allclose(atb_f, atb[k], atol=5e-3)


def test_priors_fix_scale_drift(rng):
    """Between-factors carry METRIC translation: unlike pure BA (gauge-free
    scale), the priored solve must keep absolute camera distances."""
    sc_gt, (wRi, wti, X) = make_ba_problem(rng, n_cams=4, n_tracks=25, pixel_noise=0.2)
    # Shrink the initialization by 20% (scale drift).
    sc0 = dataclasses.replace(
        sc_gt,
        wti=sc_gt.wti * 0.8,
        points=sc_gt.points * 0.8,
    )
    edges = [(0, 1), (1, 2), (2, 3)]
    aRb = np.stack([gt_relative(wRi, wti, a, b)[0] for a, b in edges])
    atb = np.stack([gt_relative(wRi, wti, a, b)[1] for a, b in edges])
    priors = ba.RelativePosePriors(
        edges_a=jnp.asarray([a for a, b in edges], jnp.int32),
        edges_b=jnp.asarray([b for a, b in edges], jnp.int32),
        aRb=jnp.asarray(aRb), atb=jnp.asarray(atb), weight=jnp.full(3, 50.0),
    )
    result = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=40), priors=priors)
    d01 = float(jnp.linalg.norm(result.scene.wti[1] - result.scene.wti[0]))
    d01_gt = float(np.linalg.norm(wti[1] - wti[0]))
    assert abs(d01 - d01_gt) / d01_gt < 0.02  # scale recovered


def test_no_priors_unchanged(rng):
    """priors=None must match the original code path bit-for-bit."""
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=20, pixel_noise=0.2)
    sc0 = perturb(rng, sc_gt, 1.0, 0.05, 0.05)
    r1 = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=8))
    r2 = ba.lm_optimize(sc0, ba.BAConfig(max_iterations=8), priors=None)
    np.testing.assert_array_equal(np.asarray(r1.scene.wti), np.asarray(r2.scene.wti))


def _sequential_priors(wRi, wti, n_cams, weight=50.0, stride=1):
    edges = [(i, i + stride) for i in range(0, n_cams - stride, stride)]
    aRb = np.stack([gt_relative(wRi, wti, a, b)[0] for a, b in edges])
    atb = np.stack([gt_relative(wRi, wti, a, b)[1] for a, b in edges])
    return edges, ba.RelativePosePriors(
        edges_a=jnp.asarray([a for a, b in edges], jnp.int32),
        edges_b=jnp.asarray([b for a, b in edges], jnp.int32),
        aRb=jnp.asarray(aRb), atb=jnp.asarray(atb),
        weight=jnp.full(len(edges), weight),
    )


def test_priors_on_banded_pcg_path(rng, monkeypatch):
    """Between-factors through the LARGE-N banded matrix-free PCG path —
    the Hilti-at-scale configuration the reference handles via
    rig_bundle_adjustment.py:25. The matvec absorbs the (a,b) coupling as a
    per-edge correction regardless of window boundaries; result must match
    the dense banded solve with the same priors."""
    from tests.bundle.test_ba import make_banded_problem

    sc_gt = make_banded_problem(rng, n_cams=96, n_tracks=480)
    wRi, wti = np.asarray(sc_gt.wRi), np.asarray(sc_gt.wti)
    sc0 = perturb(rng, sc_gt, rot_deg=1.0, trans=0.05, pt=0.05)
    # Priors with stride 7: most edges cross band-window boundaries.
    edges, priors = _sequential_priors(wRi, wti, 96, weight=50.0, stride=7)

    band, plan = ba.auto_band(sc0)
    assert band is not None
    cfg = ba.BAConfig(
        max_iterations=15, bucket_l=ba.auto_bucket_l(sc0), band=band,
        schur_bf16=False, pcg_iterations=80, pcg_tol=1e-8,
    )
    res_dense = ba.lm_optimize(sc0, cfg, priors=priors, band_plan=plan)

    monkeypatch.setattr(ba, "_DENSE_SCHUR_MAX_CAMERAS", 8)
    ba.lm_optimize.clear_cache()
    res_pcg = ba.lm_optimize(sc0, cfg, priors=priors, band_plan=plan)
    ba.lm_optimize.clear_cache()

    assert float(res_pcg.initial_cost) == pytest.approx(
        float(res_dense.initial_cost), rel=1e-5
    )
    assert float(res_pcg.final_cost) == pytest.approx(
        float(res_dense.final_cost), rel=2e-2
    )
    # Priors honored through the PCG path.
    Rf, tf = np.asarray(res_pcg.scene.wRi), np.asarray(res_pcg.scene.wti)
    for k, (a, b) in enumerate(edges):
        aRb_f, _ = gt_relative(Rf, tf, a, b)
        err = float(jnp.degrees(lie.rotation_angular_distance(
            jnp.asarray(aRb_f), jnp.asarray(priors.aRb[k]))))
        assert err < 0.2


def test_priors_on_bucketed_pcg_path(rng, monkeypatch):
    """Between-factors through the unbanded large-N bucketed PCG path."""
    from tests.bundle.test_ba import make_ragged_problem

    sc_gt = make_ragged_problem(rng, n_cams=10, n_tracks=60, pixel_noise=0.2)
    wRi, wti = np.asarray(sc_gt.wRi), np.asarray(sc_gt.wti)
    sc0 = perturb(rng, sc_gt, rot_deg=1.5, trans=0.06, pt=0.06)
    edges, priors = _sequential_priors(wRi, wti, 10, weight=80.0)

    cfg = ba.BAConfig(
        max_iterations=20, bucket_l=ba.auto_bucket_l(sc0), schur_bf16=False,
        pcg_iterations=80, pcg_tol=1e-8,
    )
    monkeypatch.setattr(ba, "_DENSE_SCHUR_MAX_CAMERAS", 2)
    ba.lm_optimize.clear_cache()
    res = ba.lm_optimize(sc0, cfg, priors=priors)
    ba.lm_optimize.clear_cache()

    Rf, tf = np.asarray(res.scene.wRi), np.asarray(res.scene.wti)
    for k, (a, b) in enumerate(edges):
        aRb_f, atb_f = gt_relative(Rf, tf, a, b)
        err = float(jnp.degrees(lie.rotation_angular_distance(
            jnp.asarray(aRb_f), jnp.asarray(priors.aRb[k]))))
        assert err < 0.15
        np.testing.assert_allclose(atb_f, np.asarray(priors.atb[k]), atol=1e-2)
