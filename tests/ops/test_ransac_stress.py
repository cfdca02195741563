"""Reference-grade stress tests for the two-view RANSAC engine: synthetic-E
sweeps across outlier fraction (into the 40-60% regime where the reference's
USAC operates), noise, baseline length, planar and forward-motion scenes
(mirrors reference tests/frontend/verifier/test_verifier_base.py's
synthetic-sweep strategy; VERDICT r3 items 1/4/6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.ops import ransac


# NOTE (r4): cache WRITES are disabled suite-wide in tests/conftest.py —
# XLA:CPU executable serialization segfaults late in long test processes.
# Reads stay enabled so warm entries (written by pipeline/bench runs) hit.


def make_pair(rng, n_pts=512, noise=3e-4, out_frac=0.0, planar=False,
              relief=0.0, forward=False, baseline=1.0, depth=(4.0, 8.0)):
    """One calibrated pair with gross outliers. Returns x1, x2, R, t.

    planar=True flattens the points onto a random plane; relief > 0 then
    re-adds that fraction of the depth range as off-plane variation
    (low-relief scenes — aerial surveys — rather than an exact plane)."""
    aa = (rng.normal(size=3) * 0.3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
    t = rng.normal(size=3).astype(np.float32)
    if forward:
        t = np.array([0.03, 0.03, 1.0], np.float32) + 0.02 * t
    t *= baseline / np.linalg.norm(t)
    X = np.stack(
        [rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1.5, 1.5, n_pts),
         rng.uniform(*depth, n_pts)], -1
    ).astype(np.float32)
    if planar:
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        c = X.mean(0)
        X = X - ((X - c) @ n)[:, None] * n.astype(np.float32)
        if relief > 0:
            amp = relief * (depth[1] - depth[0])
            X = X + (rng.uniform(-amp, amp, n_pts)[:, None] * n).astype(np.float32)
    X2 = X @ R.T + t
    x1 = X[:, :2] / X[:, 2:] + noise * rng.normal(size=(n_pts, 2))
    x2 = X2[:, :2] / X2[:, 2:] + noise * rng.normal(size=(n_pts, 2))
    n_out = int(n_pts * out_frac)
    out_idx = rng.choice(n_pts, n_out, replace=False)
    x2[out_idx] = rng.uniform(-0.6, 0.6, size=(n_out, 2))
    t_unit = t / np.linalg.norm(t)
    return (x1.astype(np.float32), x2.astype(np.float32), R,
            t_unit.astype(np.float32), out_idx)


def run_batch(pairs, budget=512, threshold=4e-3, key=0):
    x1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    x2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    P, N, _ = x1.shape
    return ransac.verify_essential_batched(
        jax.random.PRNGKey(key), x1, x2, jnp.ones((P, N)),
        threshold=threshold, num_hypotheses=budget,
    )


def pose_errors(res, p, pair):
    rot = float(jnp.degrees(lie.rotation_angular_distance(
        res.i2Ri1[p], jnp.asarray(pair[2]))))
    dire = np.degrees(np.arccos(np.clip(
        float(jnp.dot(res.i2Ui1[p], jnp.asarray(pair[3]))), -1, 1)))
    return rot, dire


@pytest.mark.parametrize("out_frac,min_success", [(0.4, 1.0), (0.5, 0.9), (0.6, 0.8)])
def test_high_outlier_fractions(rng, out_frac, min_success):
    """The regime the 8-point sampler could not reach (eps^8 vs eps^5):
    scripts/ransac_sweep.py measures 100% vs 31% at 50% outliers."""
    P = 8
    pairs = [make_pair(rng, out_frac=out_frac) for _ in range(P)]
    res = run_batch(pairs)
    good = 0
    for p in range(P):
        rot, dire = pose_errors(res, p, pairs[p])
        if bool(res.success[p]) and rot < 2.0 and dire < 5.0:
            good += 1
    assert good >= min_success * P, f"{good}/{P} at {out_frac} outliers"


def test_outlier_mask_precision_at_half(rng):
    """At 50% outliers the returned inlier mask must still separate the
    populations (gross outliers cannot leak into the consensus)."""
    pairs = [make_pair(rng, out_frac=0.5) for _ in range(4)]
    res = run_batch(pairs)
    for p in range(4):
        out_idx = pairs[p][4]
        inl = np.asarray(res.inlier_mask[p])
        assert inl[out_idx].mean() < 0.05
        keep = np.setdiff1d(np.arange(512), out_idx)
        assert inl[keep].mean() > 0.8


@pytest.mark.parametrize("noise,rot_tol,dir_tol", [
    (1e-4, 0.5, 1.5), (5e-4, 1.0, 3.0), (1.5e-3, 2.5, 8.0),
])
def test_noise_sweep(rng, noise, rot_tol, dir_tol):
    """Accuracy degrades gracefully with pixel noise (0.1 to 1.5 px at
    f=1000), 30% outliers throughout."""
    P = 6
    pairs = [make_pair(rng, noise=noise, out_frac=0.3) for _ in range(P)]
    # Threshold tracks the noise level as the reference's px/f does.
    res = run_batch(pairs, threshold=max(4e-3, 3.0 * noise))
    rots, dirs = [], []
    for p in range(P):
        assert bool(res.success[p])
        rot, dire = pose_errors(res, p, pairs[p])
        rots.append(rot)
        dirs.append(dire)
    assert np.median(rots) < rot_tol, rots
    assert np.median(dirs) < dir_tol, dirs


def test_baseline_sweep(rng):
    """Short baselines make the translation direction ill-conditioned (at
    baseline 0.05 over depth ~8 the parallax is ~6 mrad against 0.3 mrad
    noise, so tens of degrees of direction error are physical, not a solver
    defect). Rotation must stay accurate at EVERY baseline, and the median
    direction error must improve monotonically with baseline."""
    P = 6
    med_dirs = {}
    for baseline in (0.05, 1.0, 3.0):
        pairs = [make_pair(rng, out_frac=0.2, baseline=baseline,
                           depth=(6.0, 10.0)) for _ in range(P)]
        res = run_batch(pairs)
        rots, dirs = [], []
        for p in range(P):
            assert bool(res.success[p])
            rot, dire = pose_errors(res, p, pairs[p])
            rots.append(rot)
            dirs.append(dire)
        assert np.median(rots) < 1.0, (baseline, rots)
        med_dirs[baseline] = np.median(dirs)
    assert med_dirs[3.0] < med_dirs[1.0] * 2.0  # both should be tiny
    assert med_dirs[1.0] < 3.0, med_dirs
    assert med_dirs[1.0] < med_dirs[0.05]


def test_low_relief_scene_with_outliers(rng):
    """Low-relief (5% depth variation) + 35% outliers — the aerial-survey
    regime where the linear 8-point minimal sample is near-rank-deficient;
    the 5-point stage and the H-pool keep the pose recoverable."""
    P = 6
    pairs = [make_pair(rng, out_frac=0.35, planar=True, relief=0.05)
             for _ in range(P)]
    res = run_batch(pairs)
    ok = 0
    for p in range(P):
        rot, dire = pose_errors(res, p, pairs[p])
        if bool(res.success[p]) and rot < 2.0 and dire < 10.0:
            ok += 1
    assert ok >= P - 1, f"{ok}/{P} low-relief pairs recovered"


def test_exact_planar_model_consistency(rng):
    """EXACTLY coplanar points admit a 2-dof family of compatible essential
    matrices, so the returned pose branch is structurally ambiguous (the
    reference's USAC shares this property; its GRIC/Degensac verifiers
    exist to detect it — see ops/verifiers.py). The testable contract here:
    the selected MODEL must still be consistent (captures the true inlier
    population, excludes the gross outliers)."""
    P = 4
    pairs = [make_pair(rng, out_frac=0.35, planar=True) for _ in range(P)]
    res = run_batch(pairs)
    for p in range(P):
        assert bool(res.success[p])
        out_idx = pairs[p][4]
        inl = np.asarray(res.inlier_mask[p])
        keep = np.setdiff1d(np.arange(512), out_idx)
        assert inl[keep].mean() > 0.85
        assert inl[out_idx].mean() < 0.1


def test_forward_motion_with_outliers(rng):
    """Near-forward translation + 30% outliers (epipole inside the image —
    the classically hard case)."""
    P = 6
    pairs = [make_pair(rng, out_frac=0.3, forward=True) for _ in range(P)]
    res = run_batch(pairs)
    ok = 0
    for p in range(P):
        rot, dire = pose_errors(res, p, pairs[p])
        if bool(res.success[p]) and rot < 2.0 and dire < 10.0:
            ok += 1
    assert ok >= P - 1, f"{ok}/{P} forward pairs recovered"


def test_heterogeneous_batch(rng):
    """One batched call with planar, forward, wide-baseline and high-outlier
    pairs at once: per-pair results must match what each regime earns on its
    own (no cross-pair interference through the batch axes)."""
    pairs = [
        make_pair(rng, out_frac=0.3),
        make_pair(rng, out_frac=0.3, planar=True),
        make_pair(rng, out_frac=0.3, forward=True),
        make_pair(rng, out_frac=0.55),
        make_pair(rng, out_frac=0.0, baseline=3.0, depth=(6.0, 10.0)),
        make_pair(rng, out_frac=0.0, noise=1e-3),
    ]
    res = run_batch(pairs)
    n_ok = 0
    for p in range(len(pairs)):
        rot, dire = pose_errors(res, p, pairs[p])
        if bool(res.success[p]) and rot < 2.5 and dire < 10.0:
            n_ok += 1
    assert n_ok >= len(pairs) - 1


def test_eight_point_mode_still_works_easy(rng):
    """The legacy 8-point mode (kept for the PERF.md A/B) must remain
    functional on easy (70% inlier) pairs."""
    pairs = [make_pair(rng, out_frac=0.3) for _ in range(3)]
    x1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    x2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    res = ransac.verify_essential_batched(
        jax.random.PRNGKey(0), x1, x2, jnp.ones((3, 512)), threshold=4e-3,
        num_hypotheses=512, minimal_solver="eight",
    )
    for p in range(3):
        assert bool(res.success[p])
        rot, _ = pose_errors(res, p, pairs[p])
        assert rot < 2.0


def test_prescreen_budget_variants():
    """Pre-gate knobs (subsample size, survivor count) change cost, not
    correctness: both configs must solve a 40%-outlier pair.

    Runs in a SUBPROCESS: compiling a fresh kernel variant (max_scored=256,
    a static not used anywhere else) late in a long pytest process
    reproducibly segfaults this environment's XLA:CPU backend_compile (r4 —
    crash is in native compilation, not in this repo's code; the identical
    program compiles and passes in a fresh process every time)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, %r)
from tests.ops.test_ransac_stress import make_pair, pose_errors
from gtsfm_tpu.ops import ransac
rng = np.random.default_rng(0)
pair = make_pair(rng, out_frac=0.4)
x1 = jnp.asarray(pair[0][None]); x2 = jnp.asarray(pair[1][None])
for pc, ms in ((128, 256), (256, 512)):
    res = ransac.verify_essential_batched(
        jax.random.PRNGKey(1), x1, x2, jnp.ones((1, 512)), threshold=4e-3,
        num_hypotheses=512, prescreen_corrs=pc, max_scored=ms,
    )
    rot, dire = pose_errors(res, 0, pair)
    assert bool(res.success[0]) and rot < 2.0 and dire < 5.0, (pc, ms, rot, dire)
print("OK")
""" % (repo,)
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=repo, timeout=1200,
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]


def test_zero_e_candidate_never_wins(rng):
    """Regression (r4): a degenerate homography decomposition (d1 ~ d3 ->
    t = 0) emits E = 0 EXACTLY, and the scale-invariant Sampson ratio
    scores zero-E as a perfect all-inlier model (0 / max(0, eps) = 0 for
    every correspondence, gross outliers included). The kernel must
    invalidate ~zero-norm candidates: on a 50%-outlier pair the winning
    model can never report (near-)every correspondence as an inlier."""
    for trial in range(4):
        pair = make_pair(rng, out_frac=0.5)
        x1 = jnp.asarray(pair[0][None])
        x2 = jnp.asarray(pair[1][None])
        res = ransac.verify_essential_batched(
            jax.random.PRNGKey(trial), x1, x2, jnp.ones((1, 512)),
            threshold=4e-3, num_hypotheses=512,
        )
        # A correct model cannot fit the 50% gross outliers.
        assert float(res.inlier_ratio[0]) < 0.8, (
            trial, float(res.inlier_ratio[0]),
        )
        rot, dire = pose_errors(res, 0, pair)
        assert rot < 2.0 and dire < 5.0, (trial, rot, dire)
