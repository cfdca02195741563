"""Nistér five-point solver tests: exact synthetic minimal problems with
known ground truth, general AND planar configurations, degeneracy handling
(mirrors the accuracy demands the reference places on cv2.findEssentialMat's
internal 5-point solver, gtsfm/frontend/verifier/ransac.py:74)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import fivepoint, lie


def _make_minimal(rng, planar: bool = False, forward: bool = False):
    """One exact 5-point minimal problem. Returns (x1, x2, E_gt) float32."""
    aa = (rng.normal(size=3) * 0.3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
    t = rng.normal(size=3).astype(np.float32)
    if forward:
        t = np.array([0.05, 0.05, 1.0], np.float32) + 0.01 * t
    t /= np.linalg.norm(t)
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    if planar:
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        pts = pts - (pts @ n)[:, None] * n.astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    x1 = pts[:, :2] / pts[:, 2:]
    p2 = pts @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:]
    E = np.asarray(lie.hat(jnp.asarray(t))) @ R
    E /= np.linalg.norm(E)
    return x1.astype(np.float32), x2.astype(np.float32), E


def _best_err(E_cands, valid, E_gt):
    best = np.inf
    for k in range(E_cands.shape[0]):
        if not valid[k]:
            continue
        e = min(np.linalg.norm(E_cands[k] - E_gt), np.linalg.norm(E_cands[k] + E_gt))
        best = min(best, e)
    return best


def _batch_recovery_rate(rng, n=100, tol=1e-2, **kw):
    X1 = np.zeros((n, 5, 2), np.float32)
    X2 = np.zeros((n, 5, 2), np.float32)
    Eg = np.zeros((n, 3, 3), np.float32)
    for b in range(n):
        X1[b], X2[b], Eg[b] = _make_minimal(rng, **kw)
    E, valid = jax.jit(fivepoint.essential_from_five_point)(
        jnp.asarray(X1), jnp.asarray(X2)
    )
    E, valid = np.asarray(E), np.asarray(valid)
    errs = np.array([_best_err(E[b], valid[b], Eg[b]) for b in range(n)])
    return (errs < tol).mean(), np.median(errs)


def test_five_point_recovers_gt_general(rng):
    rate, med = _batch_recovery_rate(rng, n=100)
    assert rate >= 0.9, f"recovery rate {rate}"
    assert med < 1e-3, f"median error {med}"


def test_five_point_algebraic_residual(rng):
    """Every valid candidate must satisfy the 5 epipolar constraints."""
    X1 = np.zeros((20, 5, 2), np.float32)
    X2 = np.zeros((20, 5, 2), np.float32)
    for b in range(20):
        X1[b], X2[b], _ = _make_minimal(rng)
    E, valid = jax.jit(fivepoint.essential_from_five_point)(
        jnp.asarray(X1), jnp.asarray(X2)
    )
    p1 = np.concatenate([X1, np.ones((20, 5, 1), np.float32)], -1)
    p2 = np.concatenate([X2, np.ones((20, 5, 1), np.float32)], -1)
    res = np.abs(np.einsum("bni,bkij,bnj->bkn", p2, np.asarray(E), p1))
    res = np.where(np.asarray(valid)[:, :, None], res, 0.0)
    assert res.max() < 1e-4
    # Valid candidates must also be essential: det ~ 0 and the trace
    # constraint ~ 0 (up to f32 noise).
    Ev = np.asarray(E)
    dets = np.abs(np.linalg.det(Ev)) * np.asarray(valid)
    assert dets.max() < 3e-3  # the solver's own det validity gate


def test_five_point_planar_scene(rng):
    """Coplanar 5-point samples: the linear 8-point system is rank-deficient
    there, but the 5-point polynomial solver recovers the true pose — the
    property that makes the reference's USAC robust on low-relief scenes."""
    rate, med = _batch_recovery_rate(rng, n=100, planar=True)
    assert rate >= 0.85, f"planar recovery rate {rate}"


def test_five_point_forward_motion(rng):
    """Near-forward translation (the hard small-baseline case)."""
    rate, _ = _batch_recovery_rate(rng, n=100, forward=True)
    assert rate >= 0.8, f"forward-motion recovery rate {rate}"


def test_five_point_degenerate_sample_is_flagged_or_finite(rng):
    """Repeated points: no NaN/Inf escapes; garbage is mask-gated."""
    x1, x2, _ = _make_minimal(rng)
    x1[3] = x1[0]
    x2[3] = x2[0]  # duplicated correspondence
    x1[4] = x1[1]
    x2[4] = x2[1]
    E, valid = jax.jit(fivepoint.essential_from_five_point)(
        jnp.asarray(x1[None]), jnp.asarray(x2[None])
    )
    E, valid = np.asarray(E), np.asarray(valid)
    assert np.isfinite(E[0][np.asarray(valid[0])]).all()


def test_five_point_solution_count_distribution(rng):
    """Generic problems have 4-10 real solutions; the solver should find
    several per sample (not just one)."""
    X1 = np.zeros((50, 5, 2), np.float32)
    X2 = np.zeros((50, 5, 2), np.float32)
    for b in range(50):
        X1[b], X2[b], _ = _make_minimal(rng)
    _, valid = jax.jit(fivepoint.essential_from_five_point)(
        jnp.asarray(X1), jnp.asarray(X2)
    )
    counts = np.asarray(valid).sum(-1)
    assert counts.min() >= 2
    assert counts.mean() >= 6.0
