"""Success-vs-outlier-fraction curve: Nistér 5-point vs legacy 8-point
hypothesis sampling at a FIXED minimal-sample budget (VERDICT r3 item 1).

The reference's verifier is cv2.findEssentialMat USAC over 5-point samples
with confidence 0.999999 (gtsfm/frontend/verifier/ransac.py:74); at inlier
ratio eps the per-sample success is eps^5 vs the linear solver's eps^8, so
the 8-point variant collapses exactly where internet-photo pairs live
(40-60%% outliers). This experiment measures that on synthetic calibrated
pairs with exact GT. Accuracy is platform-independent (the same XLA program
runs on CPU and TPU); run on CPU by default.

Usage: python scripts/ransac_sweep.py [--pairs 32] [--corrs 1024]
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.ops import ransac


def make_pairs(rng, P, N, noise=3e-4, out_frac=0.3):
    """P calibrated pairs with an out_frac fraction of gross outliers."""
    x1 = np.zeros((P, N, 2), np.float32)
    x2 = np.zeros((P, N, 2), np.float32)
    Rg = np.zeros((P, 3, 3), np.float32)
    tg = np.zeros((P, 3), np.float32)
    n_out = int(N * out_frac)
    for p in range(P):
        aa = (rng.normal(size=3) * 0.3).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
        t = rng.normal(size=3).astype(np.float32)
        t /= np.linalg.norm(t)
        X = np.stack(
            [rng.uniform(-1.5, 1.5, N), rng.uniform(-1.5, 1.5, N),
             rng.uniform(4.0, 8.0, N)], -1
        ).astype(np.float32)
        X2 = X @ R.T + t
        a = X[:, :2] / X[:, 2:] + noise * rng.normal(size=(N, 2))
        b = X2[:, :2] / X2[:, 2:] + noise * rng.normal(size=(N, 2))
        # Gross outliers: replace x2 with unrelated image locations.
        idx = rng.choice(N, n_out, replace=False)
        b[idx] = rng.uniform(-0.6, 0.6, size=(n_out, 2))
        x1[p], x2[p], Rg[p], tg[p] = a, b, R, t
    return (jnp.asarray(x1), jnp.asarray(x2), Rg, tg)


def run_solver(solver, x1, x2, key, budget=512):
    P, N, _ = x1.shape
    return ransac.verify_essential_batched(
        key, x1, x2, jnp.ones((P, N)), threshold=4e-3,
        num_hypotheses=budget, minimal_solver=solver,
    )


def evaluate(res, Rg, tg, rot_tol=2.0, dir_tol=5.0):
    P = Rg.shape[0]
    succ, rot_errs = [], []
    for p in range(P):
        rot = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[p], jnp.asarray(Rg[p]))))
        dire = np.degrees(np.arccos(np.clip(float(jnp.dot(res.i2Ui1[p], jnp.asarray(tg[p]))), -1, 1)))
        ok = bool(res.success[p]) and rot < rot_tol and dire < dir_tol
        succ.append(ok)
        rot_errs.append(rot)
    return np.mean(succ), np.median(rot_errs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--corrs", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"# P={args.pairs} pairs x N={args.corrs} corrs, budget "
          f"{args.budget} minimal samples, threshold 4e-3, noise 3e-4")
    print("| outlier frac | 5-pt success | 5-pt med rot err | 8-pt success | 8-pt med rot err |")
    print("|---|---|---|---|---|")
    for out_frac in (0.3, 0.4, 0.5, 0.6, 0.7):
        x1, x2, Rg, tg = make_pairs(rng, args.pairs, args.corrs, out_frac=out_frac)
        key = jax.random.PRNGKey(42)
        r5 = run_solver("nister5", x1, x2, key, args.budget)
        r8 = run_solver("eight", x1, x2, key, args.budget)
        s5, m5 = evaluate(r5, Rg, tg)
        s8, m8 = evaluate(r8, Rg, tg)
        print(f"| {out_frac:.1f} | {s5*100:.0f}% | {m5:.3f} deg | {s8*100:.0f}% | {m8:.3f} deg |")


if __name__ == "__main__":
    main()
