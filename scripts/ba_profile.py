"""On-chip decomposition of one banded-Schur LM iteration (VERDICT r4 item 2).

Times nested PREFIXES of `_schur_solve_dense_banded` + the block build at the
bench.py problem (128 cams / 16k tracks / 131k meas) with real host-fetch
barriers (timing.time_fn); successive differences attribute the iteration
wall to stages. Optionally captures a jax.profiler trace (--trace) and
prints the top self-time ops from the device trace.

Usage: python scripts/ba_profile.py [--cams 128] [--trace]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common import timing


def build_problem(n_cams):
    import bench

    scale = n_cams / 128
    return bench.build_problem(
        n_cams=n_cams, n_tracks=int(16384 * scale), obs_per_track=8
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=128)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--cg", type=int, default=None,
                    help="use reduced_cg_iters instead of dense Cholesky")
    args = ap.parse_args()

    scene = build_problem(args.cams)
    band, band_plan = ba.auto_band(scene)
    cfg = ba.BAConfig(
        max_iterations=30, pcg_iterations=20,
        bucket_l=ba.auto_bucket_l(scene), band=band,
        reduced_cg_iters=args.cg,
    )
    assert band is not None
    C_, B_, T2, Tb, K = band
    N = scene.num_cameras_padded
    print(f"# band: C={C_} B={B_} T2={T2} Tb={Tb} K={K}; N={N}, "
          f"meas={scene.meas_cam.shape[0]}")

    # Mirror lm_optimize's prologue (sorted, banded-row layout).
    import dataclasses

    cam_fixed = jax.nn.one_hot(0, N, dtype=scene.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * scene.camera_mask
    rot = band_plan.row_of_track
    scene = dataclasses.replace(
        scene,
        points=jnp.zeros((T2, 3), scene.points.dtype).at[rot].set(scene.points),
        track_mask=jnp.zeros((T2,), scene.track_mask.dtype).at[rot].set(scene.track_mask),
        meas_track=jnp.clip(rot[scene.meas_track], 0, T2 - 1),
    )
    sort_track = jnp.where(scene.meas_mask > 0, scene.meas_track, T2)
    order = jnp.argsort(sort_track * N + scene.meas_cam)
    scene = dataclasses.replace(
        scene,
        meas_cam=scene.meas_cam[order], meas_track=scene.meas_track[order],
        meas_uv=scene.meas_uv[order], meas_mask=scene.meas_mask[order],
    )
    bucket = ba._make_band_bucket(scene, cfg.bucket_l, C_, band_plan)
    lam = jnp.asarray(1e-4, jnp.float32)

    build_j = jax.jit(
        lambda s: ba._build_blocks_banded(s, bucket, cfg, cam_free)
    )
    r, Jc, Jp, cost = build_j(scene)
    timing.sync(cost)

    # ---- Prefix functions of _schur_solve_dense_banded ----------------
    D = Jc.shape[-1]
    Wd = 2 * C_
    CD = C_ * D
    L = bucket.bmask.shape[1]

    def p_hcc(r, Jc, Jp):
        bar = jax.lax.optimization_barrier
        JJ = bar(ba._outer2(Jc, Jc).reshape(T2 * L, D * D))
        Jr = ba._matvec2(Jc, r.reshape(T2 * L, 2))
        JJr = jnp.concatenate([JJ, Jr], -1)
        ohb = bucket.onehot_loc.reshape(K, Tb * L, Wd)
        hw_blk = jax.lax.dot_general(
            ohb, JJr.reshape(K, Tb * L, D * D + D),
            (((1,), (1,)), ((0,), (0,))), preferred_element_type=r.dtype)
        hw = jax.ops.segment_sum(hw_blk, bucket.block_window, num_segments=B_,
                                 indices_are_sorted=True)
        acc = ba._win_overlap_add(hw.reshape(B_, Wd * (D * D + D)), B_,
                                  C_ * (D * D + D))
        acc = acc.reshape((B_ + 1) * C_, D * D + D)[:N]
        Hcc = bar(acc[:, : D * D].reshape(N, D, D))
        bc = -acc[:, D * D:]
        Jc_b = Jc.reshape(T2, L, 2, D)
        Jp_b = Jp.reshape(T2, L, 2, 3)
        Hpp = ba._outer2(Jp_b, Jp_b).sum(1)
        bp = -ba._matvec2(Jp_b, r.reshape(T2, L, 2)).sum(1)
        return Hcc, bc, Hpp, bp

    def p_gloc(r, Jc, Jp):
        Hcc, bc, Hpp, bp = p_hcc(r, Jc, Jp)
        bar = jax.lax.optimization_barrier
        Jc_b = Jc.reshape(T2, L, 2, D)
        Jp_b = Jp.reshape(T2, L, 2, 3)
        g_dtype = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
        W = bar(ba._outer2(Jp_b.astype(g_dtype), Jc_b.astype(g_dtype)))
        cam_loc = jnp.clip(
            bucket.cam_b - bucket.track_window[:, None] * C_, 0, Wd - 1)
        lane = jnp.arange(Wd, dtype=jnp.int32)
        G4 = jnp.zeros((T2, 3, Wd, D), g_dtype)
        for l in range(L):
            sel = (cam_loc[:, l, None] == lane[None, :]).astype(g_dtype)
            G4 = G4 + sel[:, None, :, None] * W[:, l, :, None, :]
        G_loc = bar(G4.reshape(T2, 3, Wd * D))
        return Hcc, bc, Hpp, bp, G_loc

    def p_sred(r, Jc, Jp, lam):
        Hcc, bc, Hpp, bp, G_loc = p_gloc(r, Jc, Jp)
        bar = jax.lax.optimization_barrier
        Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(3)
        Hpp_inv = bar(ba._inv3x3(Hpp_d))
        g_dtype = G_loc.dtype
        C_loc = bar(jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G_loc))
        S_blk = jax.lax.dot_general(
            G_loc.reshape(K, Tb * 3, Wd * D), C_loc.reshape(K, Tb * 3, Wd * D),
            (((1,), (1,)), ((0,), (0,))), preferred_element_type=r.dtype)
        S_win = jax.ops.segment_sum(S_blk, bucket.block_window, num_segments=B_,
                                    indices_are_sorted=True)
        return Hcc_d, Hpp_inv, bc, bp, G_loc, S_win

    def p_assemble(r, Jc, Jp, lam):
        Hcc_d, Hpp_inv, bc, bp, G_loc, S_win = p_sred(r, Jc, Jp, lam)
        Sq = S_win.reshape(B_, 2, CD, 2, CD)
        S_ext = jnp.zeros((B_ + 1, CD, B_ + 1, CD), r.dtype)
        ib = jnp.arange(B_)
        S_ext = S_ext.at[ib, :, ib, :].add(Sq[:, 0, :, 0, :])
        S_ext = S_ext.at[ib, :, ib + 1, :].add(Sq[:, 0, :, 1, :])
        S_ext = S_ext.at[ib + 1, :, ib, :].add(Sq[:, 1, :, 0, :])
        S_ext = S_ext.at[ib + 1, :, ib + 1, :].add(Sq[:, 1, :, 1, :])
        S_red = S_ext.reshape((B_ + 1) * CD, (B_ + 1) * CD)[: N * D, : N * D]
        idx = jnp.arange(N)
        S4 = (-S_red).reshape(N, D, N, D).at[idx, :, idx, :].add(Hcc_d)
        S = S4.reshape(N * D, N * D)
        hb = jnp.einsum("tij,tj->ti", Hpp_inv, bp)
        y_loc = jnp.einsum("tin,ti->tn", G_loc, hb, preferred_element_type=r.dtype)
        y_win = jax.ops.segment_sum(y_loc, bucket.track_window, num_segments=B_,
                                    indices_are_sorted=True)
        v = bc.reshape(-1) - ba._win_overlap_add(y_win, B_, CD)[: N * D]
        diag = jnp.diagonal(S)
        fix = (diag <= 1e-7).astype(r.dtype)
        S = S + jnp.diag(fix)
        return S, v, Hpp_inv, bp, G_loc

    def p_solve(r, Jc, Jp, lam):
        S, v, Hpp_inv, bp, G_loc = p_assemble(r, Jc, Jp, lam)
        dc = ba._solve_reduced(S, v, cfg, D).reshape(N, D)
        return dc, Hpp_inv, bp, G_loc

    def full(r, Jc, Jp, lam):
        return ba._schur_solve_dense_banded(r, Jc, Jp, bucket, scene, lam, cfg)

    stages = [
        ("build_blocks", build_j, (scene,)),
        ("p1 Hcc/bc/Hpp/bp", jax.jit(p_hcc), (r, Jc, Jp)),
        ("p2 +G_loc (L-loop routing)", jax.jit(p_gloc), (r, Jc, Jp)),
        ("p3 +C_loc/S_blk GEMM", jax.jit(p_sred), (r, Jc, Jp, lam)),
        ("p4 +S assemble/rhs", jax.jit(p_assemble), (r, Jc, Jp, lam)),
        ("p5 +solve_reduced", jax.jit(p_solve), (r, Jc, Jp, lam)),
        ("full solve (+backsub)", jax.jit(full), (r, Jc, Jp, lam)),
    ]
    print(f"{'stage':38s} {'ms':>8s} {'delta ms':>9s}")
    prev = None
    wall = {}
    for name, fn, a in stages:
        out = fn(*a)
        timing.sync(out)
        ms = timing.time_fn(fn, *a, n=10) * 1e3
        d = ms - prev if (prev is not None and not name.startswith("build")) else float("nan")
        if not name.startswith("build"):
            prev = ms
        else:
            wall["build"] = ms
        print(f"{name:38s} {ms:8.3f} {d:9.3f}")
    wall["solve"] = prev

    # One full LM iteration for cross-check (build + solve + update + accept).
    def one_iter(scene, r, Jc, Jp, lam):
        dc, dp = ba._schur_solve_dense_banded(r, Jc, Jp, bucket, scene, lam, cfg)
        cand = ba._update_scene(scene, dc, dp)
        rc, Jcc, Jpc, cost_c = ba._build_blocks_banded(cand, bucket, cfg, cam_free)
        return cost_c, rc

    f_it = jax.jit(one_iter)
    out = f_it(scene, r, Jc, Jp, lam)
    timing.sync(out)
    ms = timing.time_fn(f_it, scene, r, Jc, Jp, lam, n=10) * 1e3
    print(f"{'one fused LM iteration':38s} {ms:8.3f}")

    if args.trace:
        import __main__  # noqa
        with jax.profiler.trace("/tmp/jaxtrace"):
            for _ in range(10):
                out = f_it(scene, r, Jc, Jp, lam)
            timing.sync(out)
        print("trace written to /tmp/jaxtrace")


if __name__ == "__main__":
    main()
