"""Levenberg-Marquardt bundle adjustment — the framework centerpiece.

TPU-native replacement for the reference's GTSAM factor-graph BA
(gtsfm/bundle/bundle_adjustment.py:58-290: GeneralSFMFactor2Cal3Bundler
reprojection factors + LevenbergMarquardtOptimizer). Instead of a
heterogeneous C++ factor graph, the problem lives in flat measurement arrays
(SceneData's BA view) and every LM iteration is one fused XLA program:

  residual+Jacobian build   per-measurement (2x9 camera, 2x3 point blocks)
                            via vmapped forward-mode autodiff — batched,
                            MXU-tiled by XLA;
  robust loss               Huber k=1.345 on the 2D error norm (IRLS
                            weights), matching the reference's measurement
                            noise (sigma = 1 px + Huber);
  normal equations          segment-sums into block-diagonal Hcc (N,9,9) /
                            Hpp (T,3,3) and per-measurement coupling blocks;
  Schur complement          points eliminated with batched 3x3 inverses;
  reduced camera solve      matrix-free PCG with block-Jacobi preconditioner
                            (S is never materialized — its matvec is two
                            segment-sum sweeps over measurements);
  LM loop                   lax.while_loop with multiplicative damping,
                            accept/reject on robust cost.

Parameterization: camera delta = (omega[3] right-applied to R, dt[3],
dcal[3] on (f, k1, k2); principal point fixed, exactly Cal3Bundler's DOF).
Gauge: first live camera's pose is frozen (reference uses a sigma=0.1 prior,
bundle_adjustment.py:156); overall scale floats — downstream comparisons are
Sim(3)-aligned so this is harmless, and LM damping keeps the gauge direction
tame.

The whole optimizer is vmap-compatible: the batched two-view BA
(gtsfm_tpu/twoview/estimator.py) is literally `vmap(lm_optimize)` over pairs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.scene import SceneData
from gtsfm_tpu.geometry import cameras as cam_mod
from gtsfm_tpu.geometry import lie

CAM_DIM = 9  # (omega, dt, df, dk1, dk2)
PT_DIM = 3
POSE_DIM = 6  # camera block when calibration is frozen (omega, dt)


def _cam_dim(cfg: "BAConfig") -> int:
    """Camera block dimension actually carried through the Schur solve.

    With calibration frozen (the common case — reference BA defaults to
    fixed intrinsics via near-exact priors, bundle_adjustment.py:180), the
    three calibration columns are identically zero; slicing them off shrinks
    the reduced camera system from (9N)^2 to (6N)^2 — the Cholesky drops
    ~3.4x in FLOPs and every coupling tensor loses a third of its lanes."""
    return CAM_DIM if cfg.optimize_calibration else POSE_DIM


class BAConfig(NamedTuple):
    max_iterations: int = 20
    huber_k: float = 1.345  # px (reference: Huber(1.345), sigma 1px)
    robust: bool = True
    optimize_calibration: bool = False
    # One (f, k1, k2) shared by all cameras (reference --share_intrinsics):
    # solved as an exact 3x3 coordinate-descent step after each accepted LM
    # step (poses/points fixed), applied uniformly.
    share_calibration: bool = False
    pcg_iterations: int = 30
    pcg_tol: float = 1e-6
    lambda_init: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-10
    lambda_max: float = 1e6
    # Max measurements per track (static). When set, the dense Schur path
    # uses the scatter-free bucketed assembly (_schur_solve_dense_bucketed) —
    # much faster per LM iteration on TPU. Use auto_bucket_l(scene). Must be
    # >= the true max track length or excess measurements are DROPPED.
    bucket_l: int | None = None
    # Camera-BANDED Schur reduction (static metadata from auto_band(scene)):
    # (C, B, T2, Tb, K) — band stride, window count, padded/regrouped track
    # count, track block size, block count. Tracks are grouped by the camera
    # window [wC, wC+2C) containing their span; the coupling G and its S_red
    # contraction then run over 2C local camera lanes instead of all N
    # (window blocks overlap-added into S). Requires bucket_l and a matching
    # band_plan argument to lm_optimize.
    band: tuple[int, int, int, int, int] | None = None
    # bf16 storage for the camera-point coupling G (the dominant HBM tensor
    # in the bucketed Schur reduction); accumulation stays f32. LM's
    # accept/reject guards against the (tiny) step-quality loss.
    schur_bf16: bool = True
    # Solve the materialized reduced camera system with fixed-count
    # block-Jacobi PCG instead of dense Cholesky (TPU triangular solves
    # serialize ~1000x off MXU speed-of-light; a dense-matvec CG sweep is
    # pure MXU work). Inexact-Newton — guarded by LM accept/reject.
    reduced_cg_iters: int | None = None


class RelativePosePriors(NamedTuple):
    """Between-factor priors (reference bundle_adjustment.py:135
    _between_factors / BetweenFactorPose3): soft relative-pose constraints
    a->b with a scalar information weight per edge (isotropic; covariance
    scaling folded into ``weight = 1/sigma``)."""

    edges_a: jnp.ndarray  # (Ep,) int32
    edges_b: jnp.ndarray  # (Ep,)
    aRb: jnp.ndarray  # (Ep, 3, 3) measured rotation of frame b in frame a
    atb: jnp.ndarray  # (Ep, 3) measured translation of b in frame a
    weight: jnp.ndarray  # (Ep,) sqrt-information scale


class BAResult(NamedTuple):
    scene: SceneData
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray


def _apply_camera_delta(wRi, wti, cal, dc):
    R = wRi @ lie.so3_exp(dc[..., 0:3])
    t = wti + dc[..., 3:6]
    if dc.shape[-1] < CAM_DIM:  # frozen calibration: 6-dim camera delta
        return R, t, cal
    dcal = jnp.concatenate([dc[..., 6:9], jnp.zeros_like(dc[..., 0:2])], axis=-1)
    return R, t, cal + dcal


def _residual_one(dc, dp, wRi, wti, cal, X, uv):
    """Residual for ONE measurement as a function of local deltas (at 0)."""
    R, t, c = _apply_camera_delta(wRi, wti, cal, dc)
    pred, _ = cam_mod.project_bundler(R, t, c, X + dp)
    return pred - uv


_jac_one = jax.jacfwd(_residual_one, argnums=(0, 1))


def _apply_camera_delta_fisheye(wRi, wti, cal9, dc):
    """Fisheye camera update: the 3 calibration lanes map to (df shared by
    fx/fy, dk1, dk2) of the equidistant model — the dominant refinable
    parameters (reference optimizes the full Cal3Fisheye through
    GeneralSFMFactor2Cal3Fisheye, bundle_adjustment.py:106)."""
    R = wRi @ lie.so3_exp(dc[..., 0:3])
    t = wti + dc[..., 3:6]
    if dc.shape[-1] < CAM_DIM:
        return R, t, cal9
    z = jnp.zeros_like(dc[..., 0])
    dcal = jnp.stack(
        [dc[..., 6], dc[..., 6], z, z, z, dc[..., 7], dc[..., 8], z, z], -1
    )
    return R, t, cal9 + dcal


def _residual_one_fisheye(dc, dp, wRi, wti, cal9, X, uv):
    R, t, c = _apply_camera_delta_fisheye(wRi, wti, cal9, dc)
    pred, _ = cam_mod.project_fisheye(R, t, c, X + dp)
    return pred - uv


_jac_one_fisheye = jax.jacfwd(_residual_one_fisheye, argnums=(0, 1))


def _autodiff_blocks_fisheye(wRi, wti, cal9, X, uv):
    """Residual + Jacobian blocks for fisheye cameras via forward-mode
    autodiff at zero deltas (same (r, Jc (M,2,9), Jp (M,2,3)) contract as
    _analytic_blocks, so every Schur/band/distributed solver path works
    unchanged for Cal3Fisheye scenes)."""
    M = uv.shape[0]
    z_dc = jnp.zeros((M, CAM_DIM), uv.dtype)
    z_dp = jnp.zeros((M, PT_DIM), uv.dtype)
    r = jax.vmap(_residual_one_fisheye)(z_dc, z_dp, wRi, wti, cal9, X, uv)
    Jc, Jp = jax.vmap(_jac_one_fisheye)(z_dc, z_dp, wRi, wti, cal9, X, uv)
    return r, Jc, Jp


def _bmm_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched small matmul A (..., i, j) @ B (..., j, k) as broadcast
    mul + sum. XLA lowers tiny batched dot_generals (2x3 @ 3x3 etc.) to
    MXU-hostile padded matmuls; the explicit form runs on the VPU at
    bandwidth."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def _analytic_blocks(wRi, wti, cal, X, uv):
    """Closed-form residual + Jacobian blocks for all measurements at once.

    3-4x cheaper than 12-tangent forward-mode autodiff (validated to agree
    with `_jac_one` to f32 precision in tests). Shapes: inputs (M, ...) ->
    (r (M, 2), Jc (M, 2, 9), Jp (M, 2, 3)).

    Derivation (camera delta = (omega right-applied, dt, dcal)):
      p_c = R^T (X - t);       d p_c/d omega = [p_c]_x,
      d p_c/d dt = -R^T,       d p_c/dX = R^T
      pi = p_c[:2] / z;        d pi/d p_c = [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]]
      uv = f g(r2) pi + pp;    d uv/d pi = f (g I + 2 (k1 + 2 k2 r2) pi pi^T)
      d uv/d f = g pi;  d uv/d k1 = f r2 pi;  d uv/d k2 = f r2^2 pi
    """
    f = cal[:, 0]
    k1 = cal[:, 1]
    k2 = cal[:, 2]
    pp = cal[:, 3:5]

    Rt = jnp.swapaxes(wRi, -1, -2)  # (M, 3, 3) world->cam rotation
    pc = (Rt * (X - wti)[:, None, :]).sum(-1)
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    pi = pc[:, :2] / z[:, None]
    r2 = jnp.sum(pi * pi, axis=-1)
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    pred = (f * g)[:, None] * pi + pp
    r = pred - uv

    # d uv / d pi  (M, 2, 2)
    gp = 2.0 * (k1 + 2.0 * k2 * r2)
    duv_dpi = f[:, None, None] * (
        g[:, None, None] * jnp.eye(2) + gp[:, None, None] * (pi[:, :, None] * pi[:, None, :])
    )
    # d pi / d pc  (M, 2, 3)
    zinv = 1.0 / z
    dpi_dpc = jnp.stack(
        [
            jnp.stack([zinv, jnp.zeros_like(zinv), -pc[:, 0] * zinv * zinv], -1),
            jnp.stack([jnp.zeros_like(zinv), zinv, -pc[:, 1] * zinv * zinv], -1),
        ],
        axis=1,
    )
    duv_dpc = _bmm_small(duv_dpi, dpi_dpc)  # (M, 2, 3)

    J_omega = _bmm_small(duv_dpc, lie.hat(pc))  # (M, 2, 3)
    Jp = _bmm_small(duv_dpc, Rt)  # (M, 2, 3)
    J_dt = -Jp  # (M, 2, 3)
    J_f = (g[:, None] * pi)[..., None]  # (M, 2, 1)
    J_k1 = ((f * r2)[:, None] * pi)[..., None]
    J_k2 = ((f * r2 * r2)[:, None] * pi)[..., None]
    Jc = jnp.concatenate([J_omega, J_dt, J_f, J_k1, J_k2], axis=-1)  # (M, 2, 9)
    return r, Jc, Jp


def _mask_free_columns(Jc: jnp.ndarray, free: jnp.ndarray) -> jnp.ndarray:
    """Zero the POSE columns of gauge-frozen cameras. Calibration columns
    (when present) stay free for every live camera: the gauge anchor fixes
    the pose frame only — freezing its intrinsics too would pin them at
    whatever (possibly wrong) initial value and bias the whole solve
    (reference keeps calibration variables separate from the origin pose
    prior, bundle_adjustment.py:156-208)."""
    if Jc.shape[-1] <= POSE_DIM:
        return Jc * free[:, None, None]
    pose_part = Jc[..., :POSE_DIM] * free[:, None, None]
    return jnp.concatenate([pose_part, Jc[..., POSE_DIM:]], axis=-1)


def _rho_cost(e: jnp.ndarray, mask: jnp.ndarray, huber_k: float, robust: bool) -> jnp.ndarray:
    """Sum of the robust loss over masked residual norms (the LM acceptance
    metric — every block build returns it for free, saving the separate
    projection pass per iteration)."""
    if robust:
        quad = 0.5 * e**2
        lin = huber_k * (e - 0.5 * huber_k)
        rho = jnp.where(e <= huber_k, quad, lin)
    else:
        rho = 0.5 * e**2
    return jnp.sum(rho * mask)


def _build_blocks(scene: SceneData, cfg: BAConfig, cam_free: jnp.ndarray):
    """Per-measurement residuals r (M,2), Jacobian blocks Jc (M,2,9),
    Jp (M,2,3), with robust IRLS weights and masks folded in, plus the
    robust cost at this scene."""
    wRi = scene.wRi[scene.meas_cam]
    wti = scene.wti[scene.meas_cam]
    cal = scene.cal[scene.meas_cam]
    X = scene.points[scene.meas_track]
    uv = scene.meas_uv

    if scene.cal.shape[-1] == 9:
        r, Jc, Jp = _autodiff_blocks_fisheye(wRi, wti, cal, X, uv)
    else:
        r, Jc, Jp = _analytic_blocks(wRi, wti, cal, X, uv)

    # Robust Huber IRLS weight on the 2D error norm.
    mask = scene.meas_mask * scene.track_mask[scene.meas_track]
    e = jnp.linalg.norm(jnp.where(mask[:, None] > 0, r, 0.0), axis=-1)
    cost = _rho_cost(e, mask, cfg.huber_k, cfg.robust)
    if cfg.robust:
        w = jnp.minimum(1.0, cfg.huber_k / jnp.maximum(e, 1e-12))
    else:
        w = jnp.ones_like(e)
    w = w * mask
    sw = jnp.sqrt(w)[:, None]
    r = r * sw
    Jc = Jc * sw[..., None]
    Jp = Jp * sw[..., None]

    # Frozen cameras zero their rows; frozen calibration DROPS its columns
    # (the Schur solve then runs on 6-dim camera blocks).
    if not cfg.optimize_calibration:
        Jc = Jc[..., :POSE_DIM]
    Jc = _mask_free_columns(Jc, cam_free[scene.meas_cam])
    return r, Jc, Jp, cost


def robust_cost(scene: SceneData, huber_k: float, robust: bool = True) -> jnp.ndarray:
    """Total robust reprojection cost (matches the LM acceptance metric)."""
    err, _ = scene.reprojection_errors()
    m = scene.meas_mask * scene.track_mask[scene.meas_track]
    if robust:
        quad = 0.5 * err**2
        lin = huber_k * (err - 0.5 * huber_k)
        rho = jnp.where(err <= huber_k, quad, lin)
    else:
        rho = 0.5 * err**2
    return jnp.sum(rho * m)


def _robust_cost_bucketed(scene: SceneData, bucket, huber_k: float,
                          robust: bool = True) -> jnp.ndarray:
    """robust_cost evaluated on the (T, L) bucket layout (one-hot camera
    routing instead of flat gathers — the LM loop's acceptance metric).
    Numerically identical to robust_cost: same measurements, same masks."""
    T, L = bucket.bmask.shape
    N = bucket.onehot.shape[-1]
    table = jnp.concatenate([scene.wRi.reshape(N, 9), scene.wti, scene.cal], -1)
    g = bucket.onehot.reshape(T * L, N) @ table
    wRi = g[:, :9].reshape(-1, 3, 3)
    wti = g[:, 9:12]
    cal = g[:, 12:17]
    X = jnp.broadcast_to(scene.points[:, None, :], (T, L, 3)).reshape(-1, 3)
    pred, _ = cam_mod.project_bundler(wRi, wti, cal, X)
    m = (
        bucket.bmask
        * jnp.broadcast_to(scene.track_mask[:, None], (T, L))
    ).reshape(-1)
    d = pred - bucket.uv_b.reshape(-1, 2)
    err = jnp.where(m[:, None] > 0, d, 0.0)
    err = jnp.sqrt(jnp.sum(err * err, -1))
    if robust:
        quad = 0.5 * err**2
        lin = huber_k * (err - 0.5 * huber_k)
        rho = jnp.where(err <= huber_k, quad, lin)
    else:
        rho = 0.5 * err**2
    return jnp.sum(rho * m)


def _schur_solve(r, Jc, Jp, scene: SceneData, lam, cfg: BAConfig, prior_blocks=None):
    """One damped Gauss-Newton step via Schur + PCG.

    Returns (dc (N,9), dp (T,3))."""
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    D = Jc.shape[-1]
    mc = scene.meas_cam
    mt = scene.meas_track

    Hcc = jax.ops.segment_sum(
        _outer2(Jc, Jc), mc, num_segments=N
    )  # (N, D, D)
    Hpp = jax.ops.segment_sum(
        _outer2(Jp, Jp), mt, num_segments=T
    )  # (T, 3, 3)
    bc = -jax.ops.segment_sum(_matvec2(Jc, r), mc, num_segments=N)
    bp = -jax.ops.segment_sum(_matvec2(Jp, r), mt, num_segments=T)
    if prior_blocks is not None:
        Hcc, bc = _apply_prior_blocks_to_normal_eq(Hcc, bc, prior_blocks, N)

    # LM damping (multiplicative on diagonal + small absolute floor).
    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)

    Hpp_inv = _inv3x3(Hpp_d)  # (T, 3, 3) batched

    def Hpc_x(x):
        """y_p = sum_m Jp^T Jc x[cam]  -> (T, 3)."""
        v = jnp.einsum("mki,mi->mk", Jc, x[mc])  # (M, 2)
        return jax.ops.segment_sum(_matvec2(Jp, v), mt, num_segments=T)

    def Hcp_y(y):
        """out = sum_m Jc^T Jp y[track] -> (N, 9)."""
        v = jnp.einsum("mki,mi->mk", Jp, y[mt])  # (M, 2)
        return jax.ops.segment_sum(_matvec2(Jc, v), mc, num_segments=N)

    def S_matvec(x):
        direct = jnp.einsum("nij,nj->ni", Hcc_d, x)
        if prior_blocks is not None:
            direct = direct + _prior_cross_matvec(prior_blocks, x)
        y = Hpc_x(x)
        z = jnp.einsum("tij,tj->ti", Hpp_inv, y)
        return direct - Hcp_y(z)

    v_rhs = bc - Hcp_y(jnp.einsum("tij,tj->ti", Hpp_inv, bp))

    # Block-Jacobi preconditioner from damped Hcc.
    Minv = jnp.linalg.inv(Hcc_d)

    def precond(x):
        return jnp.einsum("nij,nj->ni", Minv, x)

    # PCG on the reduced camera system.
    x0 = jnp.zeros_like(v_rhs)
    r0 = v_rhs - S_matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    denom0 = jnp.maximum(jnp.sum(v_rhs * v_rhs), 1e-20)

    def pcg_body(carry):
        x, rr, z, p, rz, it = carry
        Sp = S_matvec(p)
        # Non-positive curvature (possible from bf16-rounded reduction blocks
        # near singular gauge directions): stall rather than explode — the LM
        # accept/reject loop then retries with more damping.
        pSp = jnp.sum(p * Sp)
        alpha = jnp.where(pSp > 1e-20, rz / pSp, 0.0)
        x = x + alpha * p
        rr = rr - alpha * Sp
        z = precond(rr)
        rz_new = jnp.sum(rr * z)
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return x, rr, z, p, rz_new, it + 1

    def pcg_cond(carry):
        x, rr, z, p, rz, it = carry
        return (it < cfg.pcg_iterations) & (jnp.sum(rr * rr) / denom0 > cfg.pcg_tol**2)

    dc, *_ = jax.lax.while_loop(pcg_cond, pcg_body, (x0, r0, z0, p0, rz0, 0))

    # Back-substitute points: dp = Hpp^-1 (bp - Hpc dc).
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_x(dc))
    return dc, dp


def _prior_residual_one(dc_a, dc_b, wRa, wta, wRb, wtb, aRb_m, atb_m):
    """6-dim between-factor residual as a function of the two camera deltas."""
    Ra, ta, _ = _apply_camera_delta(wRa, wta, jnp.zeros(5), dc_a)
    Rb, tb, _ = _apply_camera_delta(wRb, wtb, jnp.zeros(5), dc_b)
    aRb_pred = Ra.T @ Rb
    atb_pred = Ra.T @ (tb - ta)
    r_rot = lie.so3_log(jnp.swapaxes(aRb_m, -1, -2) @ aRb_pred)
    return jnp.concatenate([r_rot, atb_pred - atb_m])


_prior_jac_one = jax.jacfwd(_prior_residual_one, argnums=(0, 1))


def _prior_blocks(scene: SceneData, priors: RelativePosePriors, cam_free):
    """Residuals + Jacobians of the between factors, sqrt-weighted."""
    ea, eb = priors.edges_a, priors.edges_b
    z = jnp.zeros((ea.shape[0], CAM_DIM), scene.meas_uv.dtype)
    r = jax.vmap(_prior_residual_one)(
        z, z, scene.wRi[ea], scene.wti[ea], scene.wRi[eb], scene.wti[eb],
        priors.aRb, priors.atb,
    )
    Ja, Jb = jax.vmap(_prior_jac_one)(
        z, z, scene.wRi[ea], scene.wti[ea], scene.wRi[eb], scene.wti[eb],
        priors.aRb, priors.atb,
    )
    sw = priors.weight[:, None]
    r = r * sw
    Ja = Ja * sw[..., None] * cam_free[ea][:, None, None]
    Jb = Jb * sw[..., None] * cam_free[eb][:, None, None]
    return r, Ja, Jb


def prior_cost(scene: SceneData, priors: RelativePosePriors) -> jnp.ndarray:
    ea, eb = priors.edges_a, priors.edges_b
    z = jnp.zeros((ea.shape[0], CAM_DIM), scene.meas_uv.dtype)
    r = jax.vmap(_prior_residual_one)(
        z, z, scene.wRi[ea], scene.wti[ea], scene.wRi[eb], scene.wti[eb],
        priors.aRb, priors.atb,
    )
    return 0.5 * jnp.sum((r * priors.weight[:, None]) ** 2)


def _schur_solve_dense(r, Jc, Jp, scene: SceneData, lam, cfg: BAConfig, prior_blocks=None):
    """Exact reduced-camera solve: materialize S = Hcc - Hcp Hpp^-1 Hpc as a
    dense (9N, 9N) matrix via one big MXU matmul, then Cholesky.

    Wins over PCG whenever 9N fits comfortably in a dense solve (N <= ~450
    cameras): the entire Schur reduction is a single
    (9N x 3T_dense) @ (3T_dense x 9N) contraction — MXU speed-of-light —
    instead of 2*pcg_iterations sweeps over the measurement arrays.
    Memory: the dense camera-track coupling G is (T*N, 3, 9); guarded by the
    caller for size.
    """
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    mc = scene.meas_cam
    # lm_optimize pre-sorts measurements by (track * N + camera) with masked
    # rows keyed to track T (sorted last), so the track-keyed and grid-keyed
    # segment sums run in sorted mode; the masked rows' key T*N lands out of
    # range and is dropped by the scatter (their data is zeroed anyway).
    mt = jnp.where(scene.meas_mask > 0, scene.meas_track, T)
    D = Jc.shape[-1]
    sorted_by_track = True

    Hcc = jax.ops.segment_sum(_outer2(Jc, Jc), mc, num_segments=N)
    Hpp = jax.ops.segment_sum(
        _outer2(Jp, Jp), mt, num_segments=T,
        indices_are_sorted=sorted_by_track,
    )
    bc = -jax.ops.segment_sum(_matvec2(Jc, r), mc, num_segments=N)
    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Ja, Ja), ea, num_segments=N)
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Jb, Jb), eb, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Ja, rp), ea, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Jb, rp), eb, num_segments=N)
    bp = -jax.ops.segment_sum(
        _matvec2(Jp, r), mt, num_segments=T,
        indices_are_sorted=sorted_by_track,
    )

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)
    Hpp_inv = _inv3x3(Hpp_d)

    # Per-measurement coupling blocks W_m = Jp^T Jc (3 x 9), scattered into the
    # dense (track, camera) grid.
    W = _outer2(Jp, Jc)  # (M, 3, 9)
    G = jax.ops.segment_sum(
        W, mt * N + mc, num_segments=T * N, indices_are_sorted=sorted_by_track
    )  # (T*N, 3, 9)
    G = G.reshape(T, N, 3, D).transpose(0, 2, 1, 3).reshape(T, 3, N * D)

    C = jnp.einsum("tij,tjn->tin", Hpp_inv, G)  # (T, 3, 9N)
    S_red = jnp.einsum("tin,tim->nm", G, C)  # (9N, 9N) — the big matmul

    S = jnp.zeros((N * D, N * D), r.dtype)
    idx = jnp.arange(N)
    S4 = S.reshape(N, D, N, D).at[idx, :, idx, :].set(Hcc_d)
    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        cross = jnp.einsum("eki,ekj->eij", Ja, Jb)  # (Ep, 9, 9)
        S4 = S4.at[ea, :, eb, :].add(cross)
        S4 = S4.at[eb, :, ea, :].add(jnp.swapaxes(cross, -1, -2))
    S = S4.reshape(N * D, N * D)
    S = S - S_red

    v = bc.reshape(-1) - jnp.einsum("tin,ti->n", G, jnp.einsum("tij,tj->ti", Hpp_inv, bp))

    # Frozen cameras have zeroed Jacobian columns -> zero rows/cols in S; put
    # identity there so the factorization is well posed (their dc stays 0).
    diag = jnp.diagonal(S)
    fix = (diag <= 1e-7).astype(r.dtype)
    S = S + jnp.diag(fix)

    dc = _solve_reduced(S, v, cfg, D).reshape(N, D)

    # Back-substitute points: dp = Hpp^-1 (bp - Hpc dc).
    Hpc_dc = jnp.einsum("tin,n->ti", G, dc.reshape(-1))
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
    return dc, dp


class _Bucket(NamedTuple):
    """Per-track (T, L) measurement layout (computed once per solve). Row t
    holds track t's measurements; the track index is implicit."""

    cam_b: jnp.ndarray  # (T, L) int32 camera per slot
    uv_b: jnp.ndarray  # (T, L, 2)
    bmask: jnp.ndarray  # (T, L) {0,1}
    onehot: jnp.ndarray  # (T, L, N) camera one-hot * bmask


def _make_bucket(scene: SceneData, L: int) -> _Bucket:
    """Build the bucket layout with gathers (no scatters).

    Requires measurements sorted by (track, cam) with masked rows keyed to
    track T (sorted last) — lm_optimize's sort order.
    """
    T = scene.num_tracks_padded
    N = scene.num_cameras_padded
    M = scene.meas_cam.shape[0]
    mt_eff = jnp.where(scene.meas_mask > 0, scene.meas_track, T)
    start = jnp.searchsorted(mt_eff, jnp.arange(T + 1))
    counts = start[1:] - start[:-1]  # (T,)
    l_idx = jnp.arange(L)
    valid = l_idx[None, :] < counts[:, None]  # (T, L)
    src = jnp.minimum(start[:-1][:, None] + l_idx[None, :], M - 1).reshape(-1)
    bmask = valid.astype(scene.meas_uv.dtype)
    cam_b = scene.meas_cam[src].reshape(T, L) * valid
    uv_b = scene.meas_uv[src].reshape(T, L, 2) * bmask[..., None]
    onehot = jax.nn.one_hot(cam_b, N, dtype=scene.meas_uv.dtype) * bmask[..., None]
    return _Bucket(cam_b=cam_b, uv_b=uv_b, bmask=bmask, onehot=onehot)


def _build_blocks_bucketed(scene: SceneData, bucket: _Bucket, cfg: BAConfig,
                           cam_free: jnp.ndarray,
                           points: jnp.ndarray | None = None,
                           track_mask: jnp.ndarray | None = None):
    """Residual/Jacobian blocks directly in the (T, L) bucket layout —
    the point gather disappears entirely (row t IS track t) and no flat
    intermediates exist for XLA to re-fuse into every consumer.

    points/track_mask default to the scene's; pass explicit TRACK-SHARDED
    slices (matching bucket's row range) inside shard_map.

    Returns r (T*L, 2), Jc (T*L, 2, 9), Jp (T*L, 2, 3), masked + weighted.
    """
    if points is None:
        points = scene.points
    if track_mask is None:
        track_mask = scene.track_mask
    T, L = bucket.bmask.shape
    N = bucket.onehot.shape[-1]
    # Camera-state routing as ONE one-hot matmul against a packed (N, 18)
    # table (wRi 9 | wti 3 | cal 5 | cam_free 1) — ~1.5x faster than three
    # row gathers on TPU (gathers serialize). Masked slots route camera 0;
    # their blocks are zeroed below.
    C5 = scene.cal.shape[-1]  # 5 = Cal3Bundler, 9 = Cal3Fisheye
    table = jnp.concatenate(
        [scene.wRi.reshape(N, 9), scene.wti, scene.cal, cam_free[:, None]], -1
    )
    g = bucket.onehot.reshape(T * L, N) @ table  # (T*L, 13 + C5)
    wRi = g[:, :9].reshape(-1, 3, 3)
    wti = g[:, 9:12]
    cal = g[:, 12 : 12 + C5]
    cam_free_slot = g[:, 12 + C5]
    X = jnp.broadcast_to(points[:, None, :], (T, L, 3)).reshape(-1, 3)
    uv = bucket.uv_b.reshape(-1, 2)

    if C5 == 9:
        r, Jc, Jp = _autodiff_blocks_fisheye(wRi, wti, cal, X, uv)
    else:
        r, Jc, Jp = _analytic_blocks(wRi, wti, cal, X, uv)

    # Invalid slots hold garbage inputs (cam 0 / uv 0 / pad-track points) that
    # can overflow to inf inside the projection — SELECT to zero before any
    # multiply (inf * 0 = nan).
    tmask = jnp.broadcast_to(track_mask[:, None], (T, L)).reshape(-1)
    live = (bucket.bmask.reshape(-1) * tmask) > 0
    r = jnp.where(live[:, None], r, 0.0)
    Jc = jnp.where(live[:, None, None], Jc, 0.0)
    Jp = jnp.where(live[:, None, None], Jp, 0.0)

    e = jnp.linalg.norm(r, axis=-1)
    mask = bucket.bmask.reshape(-1) * tmask
    cost = _rho_cost(e, mask, cfg.huber_k, cfg.robust)
    if cfg.robust:
        w = jnp.minimum(1.0, cfg.huber_k / jnp.maximum(e, 1e-12))
    else:
        w = jnp.ones_like(e)
    w = w * mask
    sw = jnp.sqrt(w)[:, None]
    r = r * sw
    Jc = Jc * sw[..., None]
    Jp = Jp * sw[..., None]
    if not cfg.optimize_calibration:
        Jc = Jc[..., :POSE_DIM]
    Jc = _mask_free_columns(Jc, cam_free_slot)
    # Force materialization: without the barrier XLA fuses this whole block
    # build into each of the solver's several consumers and recomputes it.
    return jax.lax.optimization_barrier((r, Jc, Jp, cost))


def _schur_solve_dense_bucketed(r, Jc, Jp, bucket, scene: SceneData, lam, cfg: BAConfig,
                                prior_blocks=None):
    """Scatter-free exact reduced-camera solve.

    TPU scatters serialize (the (T*N, 3, 9) grid segment-sum alone costs more
    than the entire reduction should); this path replaces every scatter with
    gathers + one-hot matmuls, which run on the MXU at bandwidth:

      bucket     (T, L) per-track layout of the flat measurements — a gather
      Hcc, bc    one (N x TL) @ (TL x .) matmul against the camera one-hot
      G          per-track (N x L) @ (L x 27) batched matmul (no grid scatter,
                 already in (t, 3, n, 9) layout — no transpose)
      S_red      one (3T x 9N)^T (3T x 9N) MXU contraction
      Cholesky   9N x 9N

    ~6x faster per LM iteration than the scatter-grid variant on a
    128-cam / 131k-measurement problem (measured on TPU v5e).
    """
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    D = Jc.shape[-1]
    onehot = bucket.onehot
    L = bucket.bmask.shape[1]

    # Blocks arrive already bucketed + masked (from _build_blocks_bucketed).
    r_f = r
    Jc_f = Jc
    Jp_f = Jp
    Jc_b = Jc_f.reshape(T, L, 2, D)
    Jp_b = Jp_f.reshape(T, L, 2, 3)

    # optimization_barrier between stages: XLA otherwise fuses producers into
    # every consumer and recomputes them (measured 1.3-1.6x on this solve).
    bar = jax.lax.optimization_barrier

    oh2 = onehot.reshape(T * L, N)
    JJ = bar(_outer2(Jc_f, Jc_f).reshape(T * L, D * D))
    Hcc = bar((oh2.T @ JJ).reshape(N, D, D))
    Jr = _matvec2(Jc_f, r_f.reshape(T * L, 2))
    bc = -(oh2.T @ Jr)  # (N, 9)
    Hpp = _outer2(Jp_b, Jp_b).sum(1)
    bp = -_matvec2(Jp_b, r_f.reshape(T, L, 2)).sum(1)

    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Ja, Ja), ea, num_segments=N)
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Jb, Jb), eb, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Ja, rp), ea, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Jb, rp), eb, num_segments=N)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)
    Hpp_inv = bar(_inv3x3(Hpp_d))

    # Dense coupling G = one-hot camera expansion of W, in bf16 (the dominant
    # HBM tensor); C = Hpp_inv G; S_red = G^T C as one MXU contraction.
    # (A symmetric sqrt(Hpp_inv)-folded S_red = B^T B variant with a G-free
    # rhs/backsubstitution measured ~15% SLOWER end-to-end on v5e — the extra
    # per-track passes cost more than the saved C array — so the plain G/C
    # form stays. A Pallas kernel computing the B^T B form with B resident
    # in VMEM was benchmarked against this XLA path at 3 sizes
    # (scripts/schur_bench.py, PERF.md): the XLA path won by ~25% at every
    # size — the one-hot lane expansion is routing-bound either way and
    # XLA's bf16 B materialization amortizes better — so the kernel was
    # removed (r3).
    g_dtype = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
    # bf16 inputs to the 2-row outer product: halves the dominant read+write
    # traffic of the coupling build (measured on the banded path; {0,1}
    # routing and f32 damping math unchanged).
    W = bar(_outer2(Jp_b.astype(g_dtype), Jc_b.astype(g_dtype)))  # (T, L, 3, D)
    # The one-hot expansion einsum runs with BOTH inputs pre-cast to bf16
    # (routing entries {0,1} are exact; the result was bf16 anyway —
    # bitwise identical, ~25% faster than casting the f32 einsum output).
    G = bar(
        jnp.einsum(
            "tln,tlij->tinj", onehot.astype(g_dtype), W.astype(g_dtype),
            preferred_element_type=g_dtype,
        ).reshape(T, 3, N * D)
    )
    C = bar(jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G))
    S_red = bar(jax.lax.dot_general(
        G.reshape(T * 3, N * D), C.reshape(T * 3, N * D), (((0,), (0,)), ((), ())),
        preferred_element_type=r.dtype,
    ))  # (9N, 9N) f32

    idx = jnp.arange(N)
    S4 = jnp.zeros((N, D, N, D), r.dtype).at[idx, :, idx, :].set(Hcc_d)
    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        cross = jnp.einsum("eki,ekj->eij", Ja, Jb)
        S4 = S4.at[ea, :, eb, :].add(cross)
        S4 = S4.at[eb, :, ea, :].add(jnp.swapaxes(cross, -1, -2))
    S = S4.reshape(N * D, N * D) - S_red

    # rhs and back-substitution read bf16 G directly (f32 accumulation); the
    # W + one-hot routed alternative measured ~1.2 ms SLOWER — the two extra
    # (TL x N) routing matmuls cost more than two bf16 G sweeps.
    v = bc.reshape(-1) - jnp.einsum(
        "tin,ti->n", G, jnp.einsum("tij,tj->ti", Hpp_inv, bp),
        preferred_element_type=r.dtype,
    )

    diag = jnp.diagonal(S)
    fix = (diag <= 1e-7).astype(r.dtype)
    S = S + jnp.diag(fix)

    dc = _solve_reduced(S, v, cfg, D).reshape(N, D)
    Hpc_dc = jnp.einsum("tin,n->ti", G, dc.reshape(-1), preferred_element_type=r.dtype)
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
    return dc, dp


def _schur_solve_pcg_bucketed(r, Jc, Jp, bucket, scene: SceneData, lam, cfg: BAConfig,
                              prior_blocks=None):
    """Scatter-free matrix-free Schur + PCG for LARGE camera counts.

    The flat PCG path (_schur_solve) routes every matvec through segment-sum
    scatters, which serialize on TPU. Here the S-matvec is two MXU matmuls
    against the camera one-hot (bf16 routing table, exact for {0,1}):

      A        = chol(Hpp_inv)^T W  per (track, slot)  — (T, L, 3, 9), built
                 once per LM iteration; S = Hcc_d - A^T A with A's camera
                 structure applied by one-hot routing
      matvec   x -> route x to slots (TL x N matmul) -> per-track 3-vector
                 y = sum_l A_tl x_tl -> route back (N x TL matmul)
      PCG      block-Jacobi preconditioner from damped Hcc

    Used when the dense (9N)^2 Cholesky is out of reach (N > ~400 cameras).
    """
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    D = Jc.shape[-1]
    L = bucket.bmask.shape[1]
    # Matvec routing dtype: bf16 halves the dominant HBM tensor (the TL x N
    # routing table; its {0,1} entries are exact) at the cost of rounding the
    # routed vectors to bf16 — an inexact-Newton inner solve, guarded by LM
    # accept/reject. schur_bf16=False (e.g. the final filtering stage) keeps
    # everything f32.
    route_dtype = jnp.bfloat16 if cfg.schur_bf16 else jnp.float32
    onehot2 = bucket.onehot.reshape(T * L, N).astype(route_dtype)

    Jc_b = Jc.reshape(T, L, 2, D)
    Jp_b = Jp.reshape(T, L, 2, 3)
    bar = jax.lax.optimization_barrier

    oh_f32 = bucket.onehot.reshape(T * L, N)
    JJ = bar(_outer2(Jc, Jc).reshape(T * L, D * D))
    Hcc = bar((oh_f32.T @ JJ).reshape(N, D, D))
    Jr = _matvec2(Jc, r.reshape(T * L, 2))
    bc = -(oh_f32.T @ Jr)  # (N, 9)
    if prior_blocks is not None:
        Hcc, bc = _apply_prior_blocks_to_normal_eq(Hcc, bc, prior_blocks, N)
    Hpp = _outer2(Jp_b, Jp_b).sum(1)
    bp = -_matvec2(Jp_b, r.reshape(T, L, 2)).sum(1)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)
    Hpp_inv = bar(_inv3x3(Hpp_d))

    # A = U^T W with U = chol(Hpp_inv): S_red = (A routed)^T (A routed).
    W = bar(_outer2(Jp_b, Jc_b))  # (T, L, 3, 9)
    U = _chol3x3(Hpp_inv)
    u = lambda k, i: U[:, None, k, i, None]
    W0, W1, W2 = W[:, :, 0], W[:, :, 1], W[:, :, 2]
    A = bar(jnp.stack(
        [
            u(0, 0) * W0 + u(1, 0) * W1 + u(2, 0) * W2,
            u(1, 1) * W1 + u(2, 1) * W2,
            u(2, 2) * W2,
        ],
        axis=2,
    ))  # (T, L, 3, 9)

    def S_matvec(x):  # x (N, 9)
        x_slot = (onehot2 @ x.astype(route_dtype)).astype(x.dtype)  # (TL, 9)
        x_slot = x_slot.reshape(T, L, D)
        y = jnp.einsum("tlij,tlj->ti", A, x_slot)  # (T, 3)
        back = jnp.einsum("tlij,ti->tlj", A, y).reshape(T * L, D)
        red = (onehot2.T @ back.astype(route_dtype)).astype(x.dtype)  # (N, 9)
        direct = jnp.einsum("nij,nj->ni", Hcc_d, x)
        if prior_blocks is not None:
            direct = direct + _prior_cross_matvec(prior_blocks, x)
        return direct - red

    # rhs: v = bc - W^T Hpp_inv bp, routed back to cameras.
    hb = jnp.einsum("tij,tj->ti", Hpp_inv, bp)  # (T, 3)
    wb = jnp.einsum("tlij,ti->tlj", W, hb).reshape(T * L, D)
    v_rhs = bc - (oh_f32.T @ wb)

    Minv = jnp.linalg.inv(Hcc_d)

    def precond(x):
        return jnp.einsum("nij,nj->ni", Minv, x)

    x0 = jnp.zeros_like(v_rhs)
    r0 = v_rhs - S_matvec(x0)
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0)
    denom0 = jnp.maximum(jnp.sum(v_rhs * v_rhs), 1e-20)

    def pcg_body(carry):
        x, rr, z, p, rz, it = carry
        Sp = S_matvec(p)
        # Non-positive curvature (possible from bf16-rounded reduction blocks
        # near singular gauge directions): stall rather than explode — the LM
        # accept/reject loop then retries with more damping.
        pSp = jnp.sum(p * Sp)
        alpha = jnp.where(pSp > 1e-20, rz / pSp, 0.0)
        x = x + alpha * p
        rr = rr - alpha * Sp
        z = precond(rr)
        rz_new = jnp.sum(rr * z)
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return x, rr, z, p, rz_new, it + 1

    def pcg_cond(carry):
        x, rr, z, p, rz, it = carry
        return (it < cfg.pcg_iterations) & (jnp.sum(rr * rr) / denom0 > cfg.pcg_tol**2)

    dc, *_ = jax.lax.while_loop(pcg_cond, pcg_body, (x0, r0, z0, z0, rz0, 0))

    # Back-substitute points: dp = Hpp_inv (bp - W dc[routing]).
    dc_slot = (onehot2 @ dc.astype(route_dtype)).astype(dc.dtype).reshape(T, L, D)
    Hpc_dc = jnp.einsum("tlij,tlj->ti", W, dc_slot)
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
    return dc, dp


class BandPlan(NamedTuple):
    """Host-computed track→banded-row layout (see BAConfig.band).

    Rows are tracks regrouped by camera window, each window padded to whole
    blocks of Tb rows (dummy rows are fully masked)."""

    row_of_track: jnp.ndarray  # (T,) int32 — banded row of each input track
    old_of_row: jnp.ndarray  # (T2,) int32 — input track per row (0 for dummy)
    track_window: jnp.ndarray  # (T2,) int32 — window index per row
    block_window: jnp.ndarray  # (K,) int32 — window index per Tb-row block


def auto_band(
    scene: SceneData,
    tb: int = 128,
    min_cameras: int = 64,
) -> tuple[tuple[int, int, int, int, int] | None, BandPlan | None]:
    """Detect camera-band structure (host-side). Returns (statics, plan) for
    BAConfig.band / lm_optimize(band_plan=...), or (None, None) when banding
    is not applicable (few cameras, or track spans cover the camera range —
    e.g. unordered internet collections).

    Profitable when every track's camera span fits a 2C window with C <= N/4:
    the Schur coupling then contracts over 2C*9 local lanes instead of N*9.
    """
    import numpy as _np

    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    if N < min_cameras:
        return None, None
    mt = _np.asarray(scene.meas_track)
    mc = _np.asarray(scene.meas_cam)
    mm = _np.asarray(scene.meas_mask) > 0
    smin = _np.full(T, N, _np.int64)
    smax = _np.full(T, -1, _np.int64)
    _np.minimum.at(smin, mt[mm], mc[mm])
    _np.maximum.at(smax, mt[mm], mc[mm])
    live = smax >= 0
    if not live.any():
        return None, None
    c = 4
    C_ = None
    while c * 4 <= N:
        w = smin // c
        if _np.all(~live | (smax < (w + 2) * c)):
            C_ = c
            break
        c *= 2
    if C_ is None:
        return None, None
    B_ = (N + C_ - 1) // C_
    win = _np.where(live, smin // C_, 0).astype(_np.int64)
    order = _np.argsort(win, kind="stable")
    counts = _np.bincount(win, minlength=B_)
    row_of_track = _np.zeros(T, _np.int64)
    track_window = []
    t2 = 0
    pos = 0
    for wdx in range(B_):
        n_w = int(counts[wdx])
        nblk = -(-n_w // tb)  # ceil
        rows = order[pos : pos + n_w]
        row_of_track[rows] = t2 + _np.arange(n_w)
        track_window.append(_np.full(nblk * tb, wdx, _np.int64))
        t2 += nblk * tb
        pos += n_w
    if t2 == 0:
        return None, None
    track_window = _np.concatenate(track_window)
    old_of_row = _np.zeros(t2, _np.int64)
    old_of_row[row_of_track] = _np.arange(T)
    K = t2 // tb
    statics = (int(C_), int(B_), int(t2), int(tb), int(K))
    plan = BandPlan(
        row_of_track=jnp.asarray(row_of_track, jnp.int32),
        old_of_row=jnp.asarray(old_of_row, jnp.int32),
        track_window=jnp.asarray(track_window, jnp.int32),
        block_window=jnp.asarray(track_window[::tb], jnp.int32),
    )
    return statics, plan


class _BandBucket(NamedTuple):
    """(T2, L) banded measurement layout: like _Bucket but the camera one-hot
    spans only the row's 2C-wide local window."""

    cam_b: jnp.ndarray  # (T2, L) GLOBAL camera index
    uv_b: jnp.ndarray  # (T2, L, 2)
    bmask: jnp.ndarray  # (T2, L)
    onehot_loc: jnp.ndarray  # (T2, L, 2C) local-window one-hot * bmask
    track_window: jnp.ndarray  # (T2,)
    block_window: jnp.ndarray  # (K,)


def _make_band_bucket(scene: SceneData, L: int, C_: int, plan: BandPlan) -> _BandBucket:
    """Banded analog of _make_bucket; scene must already be in banded-row
    track order with measurements sorted by (row, cam), dead rows keyed last."""
    T2 = scene.num_tracks_padded
    M = scene.meas_cam.shape[0]
    mt_eff = jnp.where(scene.meas_mask > 0, scene.meas_track, T2)
    # method="sort": the default binary-search lowering runs 17 sequential
    # gather rounds (~1.4 ms at 131k meas); one co-sort is ~0.1 ms (r5).
    start = jnp.searchsorted(mt_eff, jnp.arange(T2 + 1), method="sort")
    counts = start[1:] - start[:-1]
    l_idx = jnp.arange(L)
    valid = l_idx[None, :] < counts[:, None]
    src = jnp.minimum(start[:-1][:, None] + l_idx[None, :], M - 1).reshape(-1)
    bmask = valid.astype(scene.meas_uv.dtype)
    # One packed row-gather instead of two (index-rate-bound; see the
    # lm_optimize prologue note).
    packed = jnp.stack(
        [
            scene.meas_cam.astype(jnp.float32),
            scene.meas_uv[..., 0].astype(jnp.float32),
            scene.meas_uv[..., 1].astype(jnp.float32),
        ],
        -1,
    )[src]
    cam_b = packed[:, 0].astype(scene.meas_cam.dtype).reshape(T2, L) * valid
    uv_b = (packed[:, 1:3].astype(scene.meas_uv.dtype).reshape(T2, L, 2)
            * bmask[..., None])
    cam_loc = jnp.clip(cam_b - plan.track_window[:, None] * C_, 0, 2 * C_ - 1)
    onehot_loc = jax.nn.one_hot(cam_loc, 2 * C_, dtype=scene.meas_uv.dtype) * bmask[..., None]
    # Barrier: without it XLA REMATERIALIZES the one_hot*bmask product inside
    # the LM while-loop every iteration instead of keeping the loop-invariant
    # bucket alive (~63 us/iter at the 128-cam bench, r5 trace).
    onehot_loc = jax.lax.optimization_barrier(onehot_loc)
    return _BandBucket(
        cam_b=cam_b, uv_b=uv_b, bmask=bmask, onehot_loc=onehot_loc,
        track_window=plan.track_window, block_window=plan.block_window,
    )


def _routed_states_banded(scene: SceneData, bucket: "_BandBucket",
                          cam_free: jnp.ndarray | None):
    """Per-slot camera states via window-local one-hot routing: gather each
    Tb-row block's (Wd, 18) window table (tiny) and apply one batched
    (TbL x Wd)(Wd x 18) MXU matmul — ~2x faster than a flat per-slot gather
    (TPU gathers serialize)."""
    N = scene.num_cameras_padded
    T2, L = bucket.bmask.shape
    Wd = bucket.onehot_loc.shape[-1]
    C_ = Wd // 2
    K = bucket.block_window.shape[0]
    Tb = T2 // K
    B_ = -(-N // C_)
    cols = [scene.wRi.reshape(N, 9), scene.wti, scene.cal]
    if cam_free is not None:
        cols.append(cam_free[:, None])
    table = jnp.concatenate(cols, -1)  # (N, S)
    S = table.shape[-1]
    ext = jnp.zeros(((B_ + 1) * C_, S), table.dtype).at[:N].set(table)
    rows = ext.reshape(B_ + 1, C_, S)
    win_table = jnp.concatenate([rows[:-1], rows[1:]], axis=1)  # (B, Wd, S)
    blk_table = win_table[bucket.block_window]  # (K, Wd, S) — tiny gather
    ohb = bucket.onehot_loc.reshape(K, Tb * L, Wd)
    g = jax.lax.dot_general(
        ohb, blk_table, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=table.dtype,
    ).reshape(T2 * L, S)
    C5 = scene.cal.shape[-1]
    wRi = g[:, :9].reshape(-1, 3, 3)
    wti = g[:, 9:12]
    cal = g[:, 12 : 12 + C5]
    free = g[:, 12 + C5] if cam_free is not None else None
    return wRi, wti, cal, free


def _build_blocks_banded(scene: SceneData, bucket: _BandBucket, cfg: BAConfig,
                         cam_free: jnp.ndarray,
                         points: jnp.ndarray | None = None,
                         track_mask: jnp.ndarray | None = None,
                         emit_extras: bool = False):
    """_build_blocks_bucketed for the banded layout (gather-routed states).

    points/track_mask default to the scene's; pass explicit ROW-SHARDED
    slices (matching bucket's row range) inside shard_map.

    emit_extras: additionally return the low-precision (T2, L, 2, *) block
    views and the per-track Hpp/bp reductions the dense-banded Schur solve
    consumes. Emitting them HERE writes them once from the build's own
    fusion; recomputing them inside the solve cost ~350 us/iter of relayout
    copies + re-reads at the 128-cam bench (r5 trace). Return shape:
    (r, Jc, Jc_g, Jp_g, Hpp, bp, cost) instead of (r, Jc, Jp, cost)."""
    if points is None:
        points = scene.points
    if track_mask is None:
        track_mask = scene.track_mask
    T2, L = bucket.bmask.shape
    wRi, wti, cal, cam_free_slot = _routed_states_banded(scene, bucket, cam_free)
    X = jnp.broadcast_to(points[:, None, :], (T2, L, 3)).reshape(-1, 3)
    uv = bucket.uv_b.reshape(-1, 2)

    if scene.cal.shape[-1] == 9:
        r, Jc, Jp = _autodiff_blocks_fisheye(wRi, wti, cal, X, uv)
    else:
        r, Jc, Jp = _analytic_blocks(wRi, wti, cal, X, uv)

    tmask = jnp.broadcast_to(track_mask[:, None], (T2, L)).reshape(-1)
    live = (bucket.bmask.reshape(-1) * tmask) > 0
    r = jnp.where(live[:, None], r, 0.0)
    Jc = jnp.where(live[:, None, None], Jc, 0.0)
    Jp = jnp.where(live[:, None, None], Jp, 0.0)

    e = jnp.linalg.norm(r, axis=-1)
    mask = bucket.bmask.reshape(-1) * tmask
    cost = _rho_cost(e, mask, cfg.huber_k, cfg.robust)
    if cfg.robust:
        w = jnp.minimum(1.0, cfg.huber_k / jnp.maximum(e, 1e-12))
    else:
        w = jnp.ones_like(e)
    w = w * mask
    sw = jnp.sqrt(w)[:, None]
    r = r * sw
    Jc = Jc * sw[..., None]
    Jp = Jp * sw[..., None]
    if not cfg.optimize_calibration:
        Jc = Jc[..., :POSE_DIM]
    Jc = _mask_free_columns(Jc, cam_free_slot)
    if emit_extras:
        D = Jc.shape[-1]
        g_dtype = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
        Jc_g = Jc.reshape(T2, L, 2, D).astype(g_dtype)
        Jp_g = Jp.reshape(T2, L, 2, 3).astype(g_dtype)
        Jp_b = Jp.reshape(T2, L, 2, 3)
        Hpp = _outer2(Jp_b, Jp_b).sum(1)
        bp = -_matvec2(Jp_b, r.reshape(T2, L, 2)).sum(1)
        return jax.lax.optimization_barrier(
            (r, Jc, Jc_g, Jp_g, Hpp, bp, cost)
        )
    return jax.lax.optimization_barrier((r, Jc, Jp, cost))


def _robust_cost_banded(scene: SceneData, bucket: _BandBucket, huber_k: float,
                        robust: bool = True) -> jnp.ndarray:
    """robust_cost on the banded (T2, L) layout (gather-routed states)."""
    T2, L = bucket.bmask.shape
    wRi, wti, cal, _ = _routed_states_banded(scene, bucket, None)
    X = jnp.broadcast_to(scene.points[:, None, :], (T2, L, 3)).reshape(-1, 3)
    pred, _ = cam_mod.project_bundler(wRi, wti, cal, X)
    m = (bucket.bmask * jnp.broadcast_to(scene.track_mask[:, None], (T2, L))).reshape(-1)
    d = pred - bucket.uv_b.reshape(-1, 2)
    err = jnp.where(m[:, None] > 0, d, 0.0)
    err = jnp.sqrt(jnp.sum(err * err, -1))
    if robust:
        quad = 0.5 * err**2
        lin = huber_k * (err - 0.5 * huber_k)
        rho = jnp.where(err <= huber_k, quad, lin)
    else:
        rho = 0.5 * err**2
    return jnp.sum(rho * m)


def _win_overlap_add(x_win: jnp.ndarray, B_: int, half: int) -> jnp.ndarray:
    """Overlap-add window vectors: (B, 2*half) rows at offsets w*half into a
    ((B+1)*half,) buffer — two contiguous slice-adds, no scatter."""
    x2 = x_win.reshape(B_, 2, half)
    out = jnp.zeros((B_ + 1, half), x_win.dtype)
    out = out.at[:B_].add(x2[:, 0])
    out = out.at[1:].add(x2[:, 1])
    return out.reshape(-1)


def _schur_solve_dense_banded(r, Jc, Jp, bucket: _BandBucket, scene: SceneData,
                              lam, cfg: BAConfig, prior_blocks=None,
                              extras=None):
    """Camera-banded scatter-free exact reduced-camera solve.

    Identical math to _schur_solve_dense_bucketed, but every one-hot routing
    runs over the track's 2C-wide LOCAL camera window instead of all N
    cameras (N/(2C)x less HBM traffic and MXU work in the dominant G/C/S_red
    chain); per-window (2C*9)^2 reduction blocks are overlap-added into the
    dense S, whose Cholesky is unchanged.

    extras: (Jc_g, Jp_g, Hpp, bp) emitted by
    _build_blocks_banded(emit_extras=True) — the low-precision block views
    and track reductions, written once inside the build fusion. When given,
    Jp may be None (every use of it is covered by the extras).
    """
    C_, B_, T2, Tb, K = cfg.band
    N = scene.num_cameras_padded
    D = Jc.shape[-1]
    Wd = 2 * C_
    L = bucket.bmask.shape[1]
    CD = C_ * D
    bar = jax.lax.optimization_barrier
    oh = bucket.onehot_loc  # (T2, L, Wd)
    # Window one-hot (K blocks -> B windows): segment_sum over the block axis
    # lowers to a serialized scatter-add on TPU (~150 us/iter for a (16, 96)
    # output in the r4 trace); a {0,1} matmul is MXU work instead (r5).
    win_oh = jax.nn.one_hot(bucket.block_window, B_, dtype=r.dtype)  # (K, B)

    def win_reduce(blk):
        """(K, X...) -> (B, X...) one-hot block->window reduction."""
        x = blk.reshape(K, -1)
        out = jax.lax.dot_general(
            win_oh, x, (((0,), (0,)), ((), ())),
            preferred_element_type=r.dtype,
        )
        return out.reshape((B_,) + blk.shape[1:])

    # Hcc + bc via window-local routing. [Jc | r] has E = D+1 columns whose
    # 2-row Gram matrix holds Hcc (D x D block), J^T r (last column) and rr
    # (unused); it is SYMMETRIC, so only the E(E+1)/2 upper-triangle
    # products are routed — 28 lanes instead of the r4 code's 42-wide
    # [vec(JJ) | Jr] concat, which cost an extra concat + two relayout
    # copies + a separate J^T r reduction (~200 us/iter of feeders at the
    # 128-cam bench, r5 trace).
    E = D + 1
    r2 = r.reshape(T2 * L, 2)

    def _jcol(i):
        return Jc[:, :, i] if i < D else r2  # (T2L, 2)

    triu = [(i, j) for i in range(E) for j in range(i, E) if (i, j) != (E - 1, E - 1)]
    prods = [
        _jcol(i)[:, 0] * _jcol(j)[:, 0] + _jcol(i)[:, 1] * _jcol(j)[:, 1]
        for (i, j) in triu
    ]
    P_ = len(triu)  # 27 for D=6
    # Stack on axis 0: the contraction (measurement) axis stays minor-most
    # in the stacked operand, which the MXU reads at full rate — the
    # axis-(-1) stack forced a transposed read that ran the whole routing
    # GEMM 11x slower (0.77 -> 0.067 ms standalone at the 128-cam bench).
    JJp = bar(jnp.stack(prods, 0))  # (P_, T2L)
    ohb = oh.reshape(K, Tb * L, Wd)
    hw_blk = jax.lax.dot_general(
        ohb, JJp.reshape(P_, K, Tb * L),
        (((1,), (2,)), ((0,), (1,))),
        preferred_element_type=r.dtype,
    )  # (K, Wd, P_)
    hw = win_reduce(hw_blk)
    acc = _win_overlap_add(hw.reshape(B_, Wd * P_), B_, C_ * P_)
    acc = acc.reshape((B_ + 1) * C_, P_)[:N]  # (N, P_) upper-tri Gram
    # Expand the packed triangle to the full (E, E) Gram with one tiny
    # constant matmul (symmetrize), then split Hcc / bc.
    expand = np.zeros((P_, E * E), np.float32)
    for k, (i, j) in enumerate(triu):
        expand[k, i * E + j] = 1.0
        expand[k, j * E + i] = 1.0
    full = (acc @ jnp.asarray(expand)).reshape(N, E, E)
    Hcc = bar(full[:, :D, :D])
    bc = -full[:, :D, D]

    if extras is not None:
        Jc_g, Jp_g, Hpp, bp = extras
        W = bar(_outer2(Jp_g, Jc_g))  # (T2, L, 3, D)
    else:
        Jp_b = Jp.reshape(T2, L, 2, 3)
        g_dt = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
        Hpp = _outer2(Jp_b, Jp_b).sum(1)
        bp = -_matvec2(Jp_b, r.reshape(T2, L, 2)).sum(1)
        # (A flat-f32 W with one late convert was tried in r5 and measured
        # net slower in context — 446 vs 465 iters/s — XLA's layout
        # assignment just moved the repack.)
        W = bar(_outer2(Jp_b.astype(g_dt),
                        Jc.reshape(T2, L, 2, D).astype(g_dt)))

    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Ja, Ja), ea, num_segments=N)
        Hcc = Hcc + jax.ops.segment_sum(jnp.einsum("eki,ekj->eij", Jb, Jb), eb, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Ja, rp), ea, num_segments=N)
        bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Jb, rp), eb, num_segments=N)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)
    Hpp_inv = bar(_inv3x3(Hpp_d))

    # Local coupling G_loc over Wd lanes (bf16; {0,1} routing exact), built
    # by compare-mask accumulation over the L slots of the pre-computed
    # per-slot coupling W — ~30% faster than the per-track
    # (Wd x L)(L x 27) einsum at these tiny-matmul shapes. Blocks are zero
    # at masked slots, so the clipped camera index of a masked slot routes
    # only zeros.
    g_dtype = W.dtype
    cam_loc = jnp.clip(bucket.cam_b - bucket.track_window[:, None] * C_, 0, Wd - 1)
    lane = jnp.arange(Wd, dtype=jnp.int32)
    G4 = jnp.zeros((T2, 3, Wd, D), g_dtype)
    for l in range(L):
        sel = (cam_loc[:, l, None] == lane[None, :]).astype(g_dtype)
        G4 = G4 + sel[:, None, :, None] * W[:, l, :, None, :]
    G_loc = bar(G4.reshape(T2, 3, Wd * D))
    C_loc = bar(jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G_loc))
    S_blk = jax.lax.dot_general(
        G_loc.reshape(K, Tb * 3, Wd * D), C_loc.reshape(K, Tb * 3, Wd * D),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=r.dtype,
    )  # (K, WdD, WdD) f32
    S_win = win_reduce(S_blk)

    # Assemble the dense reduced system SCATTER-FREE. The r4 code overlap-
    # added via 2-axis batch-diagonal .at[ib, :, ib, :].add scatters, which
    # XLA lowered to two transposing relayout copies of the full dense S
    # every iteration (~320 us at 128 cams — the single largest op pair in
    # the r4 LM-step trace). Instead: build per-row-window band STRIPS
    # [left | diag | right] with shifts/concats, then place the strips at
    # their column offsets with one {0,1} placement GEMM.
    Bw = B_ + 1
    Sq = S_win.reshape(B_, 2, CD, 2, CD)
    zb = jnp.zeros((1, CD, CD), r.dtype)
    # Row-window i rows come from block i (top half) and block i-1 (bottom).
    diag_s = (jnp.concatenate([Sq[:, 0, :, 0, :], zb]) +
              jnp.concatenate([zb, Sq[:, 1, :, 1, :]]))  # (Bw, CD, CD)
    right_s = jnp.concatenate([Sq[:, 0, :, 1, :], zb])
    left_s = jnp.concatenate([zb, Sq[:, 1, :, 0, :]])
    # S = blockdiag(Hcc_d) - S_red: expand Hcc_d into per-window block-
    # diagonal form and fold the sign into the strips.
    Hpad = jnp.zeros((Bw * C_, D, D), r.dtype).at[:N].set(Hcc_d)
    Hw = Hpad.reshape(Bw, C_, D, D)
    eyeC = jnp.eye(C_, dtype=r.dtype)
    Hblk = (eyeC[None, :, None, :, None] * Hw[:, :, :, None, :]).reshape(
        Bw, CD, CD
    )
    strips = jnp.concatenate(
        [-left_s, Hblk - diag_s, -right_s], axis=-1
    )  # (Bw, CD, 3CD)
    Wcols = Bw * CD
    col = (jnp.arange(Bw)[:, None] - 1) * CD + jnp.arange(3 * CD)[None, :]
    shift = jax.nn.one_hot(col, Wcols, dtype=r.dtype)  # const — LICM-hoisted
    dense = jax.lax.dot_general(
        strips, shift, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=r.dtype,
    )  # (Bw, CD, Wcols)
    S = dense.reshape(Bw * CD, Wcols)[: N * D, : N * D]
    if prior_blocks is not None:
        rp, Ja, Jb, ea, eb = prior_blocks
        cross = jnp.einsum("eki,ekj->eij", Ja, Jb)
        S4 = S.reshape(N, D, N, D).at[ea, :, eb, :].add(cross)
        S4 = S4.at[eb, :, ea, :].add(jnp.swapaxes(cross, -1, -2))
        S = S4.reshape(N * D, N * D)

    # rhs via the local coupling, overlap-added to camera lanes.
    hb = jnp.einsum("tij,tj->ti", Hpp_inv, bp)
    y_loc = jnp.einsum("tin,ti->tn", G_loc, hb, preferred_element_type=r.dtype)
    y_win = win_reduce(y_loc.reshape(K, Tb, Wd * D).sum(axis=1))  # (B, WdD)
    v = bc.reshape(-1) - _win_overlap_add(y_win, B_, CD)[: N * D]

    diag = jnp.diagonal(S)
    fix = (diag <= 1e-7).astype(r.dtype)
    S = S + jnp.diag(fix)

    dc = _solve_reduced(S, v, cfg, D).reshape(N, D)

    # Back-substitute: gather each row's window slice of dc.
    dc_ext = jnp.zeros(((B_ + 1) * CD,), dc.dtype).at[: N * D].set(dc.reshape(-1))
    rows = dc_ext.reshape(B_ + 1, CD)
    dc_win = jnp.concatenate([rows[:-1], rows[1:]], axis=-1)  # (B, WdD)
    dc_tw = dc_win[bucket.track_window]  # (T2, WdD)
    Hpc_dc = jnp.einsum("tin,tn->ti", G_loc, dc_tw, preferred_element_type=r.dtype)
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
    return dc, dp


def _solve_reduced(S: jnp.ndarray, v: jnp.ndarray, cfg: BAConfig, D: int) -> jnp.ndarray:
    """Solve the materialized reduced camera system S x = v.

    Default: dense Cholesky (exact). With cfg.reduced_cg_iters set: fixed-count
    block-Jacobi PCG whose matvec is a dense (ND x ND) GEMV — MXU work instead
    of the serialized triangular solves TPU Cholesky lowers to. The
    preconditioner blocks come from S's own diagonal (gauge-fixed cameras have
    identity blocks there after the diagonal fix, so it stays well posed)."""
    if cfg.reduced_cg_iters is None:
        Lf = jax.scipy.linalg.cho_factor(S, lower=True)
        return jax.scipy.linalg.cho_solve(Lf, v)
    ND = S.shape[0]
    N = ND // D
    idx = jnp.arange(N)
    Sb = S.reshape(N, D, N, D)[idx, :, idx, :]
    Minv = jnp.linalg.inv(Sb)

    def pc(x):
        return jnp.einsum("nij,nj->ni", Minv, x.reshape(N, D)).reshape(-1)

    x = jnp.zeros_like(v)
    rr = v
    z = pc(rr)
    p = z
    rz = rr @ z

    def body(_, c):
        x, rr, p, rz = c
        Sp = S @ p
        pSp = p @ Sp
        alpha = jnp.where(pSp > 1e-30, rz / pSp, 0.0)
        x = x + alpha * p
        rr = rr - alpha * Sp
        z = pc(rr)
        rz2 = rr @ z
        beta = jnp.where(rz > 1e-30, rz2 / rz, 0.0)
        return (x, rr, z + beta * p, rz2)

    x, *_ = jax.lax.fori_loop(0, cfg.reduced_cg_iters, body, (x, rr, p, rz))
    return x


def _apply_prior_blocks_to_normal_eq(Hcc, bc, prior_blocks, N):
    """Fold between-factor priors into the reduced camera normal equations:
    diagonal blocks Ja^T Ja / Jb^T Jb into Hcc, gradient terms into bc.
    The off-diagonal (a,b) coupling is handled by _prior_cross_matvec (dense
    paths scatter it into S directly)."""
    rp, Ja, Jb, ea, eb = prior_blocks
    Hcc = Hcc + jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", Ja, Ja), ea, num_segments=N
    )
    Hcc = Hcc + jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", Jb, Jb), eb, num_segments=N
    )
    bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Ja, rp), ea, num_segments=N)
    bc = bc - jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Jb, rp), eb, num_segments=N)
    return Hcc, bc


def _prior_cross_matvec(prior_blocks, x):
    """Off-diagonal between-factor coupling applied matrix-free:
    y[a] += (Ja^T Jb) x[b], y[b] += (Ja^T Jb)^T x[a] — the matrix-free
    equivalent of the dense path's S4.at[ea,:,eb,:].add(cross). Between
    factors couple only (a, b) camera PAIRS, so the window-block banded PCG
    absorbs them as this cheap per-edge correction term regardless of whether
    the edge crosses a window boundary (reference rig_bundle_adjustment.py:25
    between-factor semantics at any scale)."""
    rp, Ja, Jb, ea, eb = prior_blocks
    cross = jnp.einsum("eki,ekj->eij", Ja, Jb)  # (Ep, D, D)
    ya = jnp.einsum("eij,ej->ei", cross, x[eb])
    yb = jnp.einsum("eji,ej->ei", cross, x[ea])
    return jnp.zeros_like(x).at[ea].add(ya).at[eb].add(yb)


def _schur_solve_pcg_banded(r, Jc, Jp, bucket: _BandBucket, scene: SceneData,
                            lam, cfg: BAConfig, prior_blocks=None):
    """Camera-banded Schur + PCG for LARGE camera counts.

    Same window-local assembly as _schur_solve_dense_banded (Hcc/bc GEMM
    routing, bf16 local coupling G_loc, per-window reduction blocks S_win
    (B, 2CD, 2CD) built ONCE per LM iteration), but the dense (ND)^2 system
    is never materialized: PCG runs with the band kept in window-block form —
    each matvec is one batched (B, 2CD, 2CD) @ (B, 2CD) product + window
    overlap-add, O(B (2CD)^2) instead of (ND)^2. Used when the dense
    Cholesky is out of reach (N > ~400 cameras) and the scene has
    camera-band structure (sequential captures).
    """
    C_, B_, T2, Tb, K = cfg.band
    N = scene.num_cameras_padded
    D = Jc.shape[-1]
    Wd = 2 * C_
    L = bucket.bmask.shape[1]
    CD = C_ * D
    bar = jax.lax.optimization_barrier
    oh = bucket.onehot_loc
    Jc_b = Jc.reshape(T2, L, 2, D)
    Jp_b = Jp.reshape(T2, L, 2, 3)

    JJ = bar(_outer2(Jc, Jc).reshape(T2 * L, D * D))
    Jr = _matvec2(Jc, r.reshape(T2 * L, 2))
    JJr = jnp.concatenate([JJ, Jr], -1)
    ohb = oh.reshape(K, Tb * L, Wd)
    hw_blk = jax.lax.dot_general(
        ohb, JJr.reshape(K, Tb * L, D * D + D),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=r.dtype,
    )
    hw = jax.ops.segment_sum(hw_blk, bucket.block_window, num_segments=B_,
                             indices_are_sorted=True)
    acc = _win_overlap_add(hw.reshape(B_, Wd * (D * D + D)), B_, C_ * (D * D + D))
    acc = acc.reshape((B_ + 1) * C_, D * D + D)[:N]
    Hcc = bar(acc[:, : D * D].reshape(N, D, D))
    bc = -acc[:, D * D :]
    if prior_blocks is not None:
        Hcc, bc = _apply_prior_blocks_to_normal_eq(Hcc, bc, prior_blocks, N)

    Hpp = _outer2(Jp_b, Jp_b).sum(1)
    bp = -_matvec2(Jp_b, r.reshape(T2, L, 2)).sum(1)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(PT_DIM)
    Hpp_inv = bar(_inv3x3(Hpp_d))

    g_dtype = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
    W = bar(_outer2(Jp_b.astype(g_dtype), Jc_b.astype(g_dtype)))  # (T2, L, 3, D)
    cam_loc = jnp.clip(bucket.cam_b - bucket.track_window[:, None] * C_, 0, Wd - 1)
    lane = jnp.arange(Wd, dtype=jnp.int32)
    G4 = jnp.zeros((T2, 3, Wd, D), g_dtype)
    for l in range(L):
        sel = (cam_loc[:, l, None] == lane[None, :]).astype(g_dtype)
        G4 = G4 + sel[:, None, :, None] * W[:, l, :, None, :]
    G_loc = bar(G4.reshape(T2, 3, Wd * D))

    # Per-window reduction blocks S_win[w] = sum_{t in w} G_t^T Hpp_inv_t G_t
    # (local 2CD lanes) — built once; every PCG matvec then runs on these
    # tiny blocks instead of sweeping the T2-row coupling.
    C_loc = bar(jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G_loc))
    S_blk = jax.lax.dot_general(
        G_loc.reshape(K, Tb * 3, Wd * D), C_loc.reshape(K, Tb * 3, Wd * D),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=r.dtype,
    )  # (K, WdD, WdD) f32
    S_win = bar(jax.ops.segment_sum(S_blk, bucket.block_window, num_segments=B_,
                                    indices_are_sorted=True))

    def window_slices(x_flat):
        """(N*D,) camera vector -> (B, WdD) per-window slices (gather-free)."""
        ext = jnp.zeros(((B_ + 1) * CD,), x_flat.dtype).at[: N * D].set(x_flat)
        rows = ext.reshape(B_ + 1, CD)
        return jnp.concatenate([rows[:-1], rows[1:]], axis=-1)  # (B, WdD)

    def route_back(y_loc):
        """(T2, WdD) per-track window vectors -> (N*D,) camera accumulation."""
        y_win = jax.ops.segment_sum(y_loc, bucket.track_window, num_segments=B_,
                                    indices_are_sorted=True)
        return _win_overlap_add(y_win, B_, CD)[: N * D]

    def S_matvec(x):  # x (N, D)
        xw = window_slices(x.reshape(-1))  # (B, WdD)
        yw = jnp.einsum("wij,wj->wi", S_win, xw)
        red = _win_overlap_add(yw, B_, CD)[: N * D].reshape(N, D)
        direct = jnp.einsum("nij,nj->ni", Hcc_d, x)
        if prior_blocks is not None:
            direct = direct + _prior_cross_matvec(prior_blocks, x)
        return direct - red

    hb = jnp.einsum("tij,tj->ti", Hpp_inv, bp)
    y_loc = jnp.einsum("tin,ti->tn", G_loc, hb, preferred_element_type=r.dtype)
    v_rhs = bc - route_back(y_loc).reshape(N, D)

    Minv = jnp.linalg.inv(Hcc_d)

    def precond(x):
        return jnp.einsum("nij,nj->ni", Minv, x)

    x0 = jnp.zeros_like(v_rhs)
    r0 = v_rhs - S_matvec(x0)
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0)
    denom0 = jnp.maximum(jnp.sum(v_rhs * v_rhs), 1e-20)

    def pcg_body(carry):
        x, rr, z, p, rz, it = carry
        Sp = S_matvec(p)
        # Non-positive curvature (possible from bf16-rounded reduction blocks
        # near singular gauge directions): stall rather than explode — the LM
        # accept/reject loop then retries with more damping.
        pSp = jnp.sum(p * Sp)
        alpha = jnp.where(pSp > 1e-20, rz / pSp, 0.0)
        x = x + alpha * p
        rr = rr - alpha * Sp
        z = precond(rr)
        rz_new = jnp.sum(rr * z)
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return x, rr, z, p, rz_new, it + 1

    def pcg_cond(carry):
        x, rr, z, p, rz, it = carry
        return (it < cfg.pcg_iterations) & (jnp.sum(rr * rr) / denom0 > cfg.pcg_tol**2)

    dc, *_ = jax.lax.while_loop(pcg_cond, pcg_body, (x0, r0, z0, z0, rz0, 0))

    # Back-substitute: dp = Hpp_inv (bp - G dc).
    dc_tw = window_slices(dc.reshape(-1))[bucket.track_window]
    Hpc_dc = jnp.einsum("tin,tn->ti", G_loc, dc_tw, preferred_element_type=r.dtype)
    dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
    return dc, dp


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det). ~25x faster than
    jnp.linalg.inv's batched LU on TPU for huge batches of tiny matrices
    (14.7ms -> 0.6ms on 16k 3x3s, v5e)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D_ = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D_ + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    rows = [jnp.stack([A, B, C], -1), jnp.stack([D_, E, F], -1), jnp.stack([G, H, I], -1)]
    return jnp.stack(rows, -2) * inv_det[..., None, None]


def _outer2(Ja: jnp.ndarray, Jb: jnp.ndarray) -> jnp.ndarray:
    """sum_k Ja[..., k, :, None] * Jb[..., k, None, :] with k-dim == 2.

    Explicit broadcast-mul form of einsum("...ki,...kj->...ij"): XLA lowers
    that einsum to batched 2-row dot_generals with terrible MXU tiling
    (4.9ms -> 0.7ms on 131k 2x9 blocks, v5e)."""
    return (
        Ja[..., 0, :, None] * Jb[..., 0, None, :]
        + Ja[..., 1, :, None] * Jb[..., 1, None, :]
    )


def _matvec2(J: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """sum_k J[..., k, :] * r[..., k, None] with k-dim == 2 (J^T r)."""
    return J[..., 0, :] * r[..., 0, None] + J[..., 1, :] * r[..., 1, None]


def _chol3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 Cholesky (lower L, L L^T = M). Elementwise —
    orders of magnitude cheaper than lax.linalg.cholesky's blocked algorithm
    on huge batches of tiny SPD matrices."""
    eps = 1e-20
    l11 = jnp.sqrt(jnp.maximum(M[..., 0, 0], eps))
    l21 = M[..., 1, 0] / l11
    l31 = M[..., 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(M[..., 1, 1] - l21 * l21, eps))
    l32 = (M[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(M[..., 2, 2] - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ],
        -2,
    )


def auto_bucket_l(scene: SceneData) -> int:
    """Max live measurements per track (host-side; pass as BAConfig.bucket_l
    to enable the scatter-free bucketed Schur path)."""
    import numpy as _np

    mt = _np.asarray(scene.meas_track)
    mask = _np.asarray(scene.meas_mask) > 0
    if not mask.any():
        return 1
    counts = _np.bincount(mt[mask], minlength=scene.num_tracks_padded)
    return max(int(counts.max()), 1)


# Dense-Schur size guard: 9N x 9N Cholesky and the (T*N, 3, 9) coupling grid.
_DENSE_SCHUR_MAX_CAMERAS = 400
_DENSE_SCHUR_MAX_GRID = 16_000_000  # T * N entries (x27 floats)


def _use_dense_schur(scene: SceneData) -> bool:
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    return N <= _DENSE_SCHUR_MAX_CAMERAS and T * N <= _DENSE_SCHUR_MAX_GRID


def _shared_calibration_step(scene: SceneData, cfg: BAConfig) -> SceneData:
    """Exact GN step on ONE shared (f, k1, k2) with poses/points fixed."""

    def res_one(dk, wRi, wti, cal, X, uv):
        cal2 = cal + jnp.concatenate([dk, jnp.zeros(2, dk.dtype)])
        pred, _ = cam_mod.project_bundler(wRi, wti, cal2, X)
        return pred - uv

    jac_one = jax.jacfwd(res_one)
    wRi = scene.wRi[scene.meas_cam]
    wti = scene.wti[scene.meas_cam]
    cal = scene.cal[scene.meas_cam]
    X = scene.points[scene.meas_track]
    z = jnp.zeros((scene.meas_cam.shape[0], 3), scene.meas_uv.dtype)
    r = jax.vmap(res_one)(z, wRi, wti, cal, X, scene.meas_uv)
    J = jax.vmap(jac_one)(z, wRi, wti, cal, X, scene.meas_uv)  # (M, 2, 3)
    e = jnp.linalg.norm(r, axis=-1)
    w = jnp.minimum(1.0, cfg.huber_k / jnp.maximum(e, 1e-12)) if cfg.robust else jnp.ones_like(e)
    w = w * scene.meas_mask * scene.track_mask[scene.meas_track]
    sw = jnp.sqrt(w)[:, None]
    rw = (r * sw).reshape(-1)
    Jw = (J * sw[..., None]).reshape(-1, 3)
    H = Jw.T @ Jw + 1e-6 * jnp.eye(3)
    dk = -jnp.linalg.solve(H, Jw.T @ rw)
    dcal = jnp.concatenate([dk, jnp.zeros(2, dk.dtype)])
    return dataclasses.replace(scene, cal=scene.cal + dcal[None, :])


def _update_scene(scene: SceneData, dc, dp) -> SceneData:
    if dc.shape[-1] < CAM_DIM:  # frozen calibration: 6-dim camera blocks
        dc = jnp.pad(dc, ((0, 0), (0, CAM_DIM - dc.shape[-1])))
    delta_fn = (_apply_camera_delta_fisheye if scene.cal.shape[-1] == 9
                else _apply_camera_delta)
    R, t, cal = delta_fn(scene.wRi, scene.wti, scene.cal, dc)
    return dataclasses.replace(
        scene, wRi=R, wti=t, cal=cal, points=scene.points + dp
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_optimize(
    scene: SceneData,
    cfg: BAConfig = BAConfig(),
    cam_fixed: jnp.ndarray | None = None,
    priors: RelativePosePriors | None = None,
    band_plan: BandPlan | None = None,
) -> BAResult:
    """Run LM to convergence (fixed max iterations, early stop on damping).

    cam_fixed: optional (N,) {0,1} — cameras to freeze. Defaults to freezing
    the first live camera (gauge anchor).
    priors: optional between-factor relative-pose priors (rig constraints,
    lidar odometry — reference _between_factors); dense-Schur path only.
    band_plan: arrays from auto_band(scene); required iff cfg.band is set.
    """
    use_band = cfg.band is not None
    band_dense = use_band and scene.num_cameras_padded <= _DENSE_SCHUR_MAX_CAMERAS
    if use_band and (band_plan is None or cfg.bucket_l is None):
        raise ValueError("cfg.band requires band_plan and bucket_l")
    N = scene.num_cameras_padded
    if cam_fixed is None:
        first_live = jnp.argmax(scene.camera_mask > 0)
        cam_fixed = jax.nn.one_hot(first_live, N, dtype=scene.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * scene.camera_mask

    T_in = scene.num_tracks_padded
    mt_orig = None
    if use_band:
        # Regroup tracks into banded rows (window-grouped, block-padded); the
        # permutation is undone on exit so callers see the input track layout.
        C_, B_, T2, Tb, K = cfg.band
        rot = band_plan.row_of_track
        mt_orig = scene.meas_track  # pre-regroup ids, for the exit un-permute
        scene = dataclasses.replace(
            scene,
            points=jnp.zeros((T2, 3), scene.points.dtype).at[rot].set(scene.points),
            track_mask=jnp.zeros((T2,), scene.track_mask.dtype).at[rot].set(scene.track_mask),
            meas_track=jnp.clip(rot[scene.meas_track], 0, T2 - 1),
        )

    # Sort measurements by (track * N + camera): the Schur solvers' track- and
    # grid-keyed segment sums then run in sorted mode. The flat measurement
    # order is semantically irrelevant (SoA with explicit indices); the
    # returned scene keeps the sorted order. For the bucketed path, masked
    # rows are keyed to track T so they sort last and fall out of the buckets.
    T_pad = scene.num_tracks_padded
    sort_track = jnp.where(scene.meas_mask > 0, scene.meas_track, T_pad)
    order = jnp.argsort(sort_track * N + scene.meas_cam)
    # ONE row-gather for all four measurement arrays: TPU gathers are
    # index-rate-bound, so 4 separate 131k-row gathers cost ~4x one packed
    # gather (~4.8 ms of the r4 prologue at the 128-cam bench; r5 trace).
    # cam/track indices round-trip exactly through f32 (< 2^24).
    cols = [
        scene.meas_cam.astype(jnp.float32),
        scene.meas_track.astype(jnp.float32),
        scene.meas_uv[..., 0].astype(jnp.float32),
        scene.meas_uv[..., 1].astype(jnp.float32),
        scene.meas_mask.astype(jnp.float32),
    ]
    if mt_orig is not None:
        # 6th column: the PRE-regroup track ids ride the same gather, so
        # the exit un-permute needs no old_of_row gather of its own (the
        # composition old_of_row[clip(rot[mt])] is mt itself; a separate
        # 131k-row epilogue gather cost ~1.5 ms — r5).
        cols.append(mt_orig.astype(jnp.float32))
    packed = jnp.stack(cols, -1)[order]
    scene = dataclasses.replace(
        scene,
        meas_cam=packed[:, 0].astype(scene.meas_cam.dtype),
        meas_track=packed[:, 1].astype(scene.meas_track.dtype),
        meas_uv=packed[:, 2:4].astype(scene.meas_uv.dtype),
        meas_mask=packed[:, 4].astype(scene.meas_mask.dtype),
    )
    if mt_orig is not None:
        mt_orig_sorted = packed[:, 5].astype(mt_orig.dtype)

    use_dense = _use_dense_schur(scene) or band_dense
    bucket = None
    if use_band:
        bucket = _make_band_bucket(scene, cfg.bucket_l, cfg.band[0], band_plan)
    elif cfg.bucket_l is not None:
        bucket = _make_bucket(scene, cfg.bucket_l)

    # NOTE: emitting the solve's bf16 block views from the build
    # (emit_extras) and carrying them through the loop was tried in r5 and
    # measured NET SLOWER (454 -> 354 iters/s at the 128-cam bench): the
    # accept-select jnp.where over packed-bf16 loop carries lowers to ~40
    # GB/s select+reshape passes that cost more than the in-solve
    # conversions they replaced. The plumbing stays for shard_map callers
    # that build and solve once (no carry), but the LM loop keeps the f32
    # (r, Jc, Jp) carry.
    emit = False

    def build(s):
        if use_band:
            return _build_blocks_banded(s, bucket, cfg, cam_free,
                                        emit_extras=emit)
        if bucket is not None:
            return _build_blocks_bucketed(s, bucket, cfg, cam_free)
        return _build_blocks(s, cfg, cam_free)

    def with_prior_cost(s, block_cost):
        if priors is not None:
            return block_cost + prior_cost(s, priors)
        return block_cost

    # The block build doubles as the cost evaluation (the builds return the
    # robust cost of their residuals), so each LM iteration runs exactly one
    # projection pass: blocks of the CANDIDATE are built to score it and are
    # carried into the next iteration when accepted.
    out0 = build(scene)
    blocks0, bcost0 = out0[:-1], out0[-1]
    cost0 = with_prior_cost(scene, bcost0)

    def body(carry):
        scene, blocks, lam, cost, it, _ = carry
        pb = None
        if priors is not None:
            rp, Ja, Jb = _prior_blocks(scene, priors, cam_free)
            # Between factors never touch calibration — their trailing
            # columns are identically zero; match the block width.
            Dk = _cam_dim(cfg)
            pb = (rp, Ja[..., :Dk], Jb[..., :Dk],
                  priors.edges_a, priors.edges_b)
        if use_band and not band_dense:
            # Large-N banded scene: window-local matrix-free PCG. Priors join
            # as per-edge correction terms in the matvec (the between-factor
            # (a,b) coupling need not respect window boundaries).
            r, Jc, Jp = blocks
            dc, dp = _schur_solve_pcg_banded(r, Jc, Jp, bucket, scene, lam, cfg, pb)
        elif use_dense:
            if use_band and emit:
                r, Jc, Jc_g, Jp_g, Hpp, bp = blocks
                dc, dp = _schur_solve_dense_banded(
                    r, Jc, None, bucket, scene, lam, cfg, pb,
                    extras=(Jc_g, Jp_g, Hpp, bp))
            elif use_band:
                r, Jc, Jp = blocks
                dc, dp = _schur_solve_dense_banded(
                    r, Jc, Jp, bucket, scene, lam, cfg, pb)
            elif bucket is not None:
                r, Jc, Jp = blocks
                dc, dp = _schur_solve_dense_bucketed(r, Jc, Jp, bucket, scene, lam, cfg, pb)
            else:
                r, Jc, Jp = blocks
                dc, dp = _schur_solve_dense(r, Jc, Jp, scene, lam, cfg, pb)
        elif bucket is not None:
            # Large camera count: scatter-free bucketed matrix-free PCG.
            r, Jc, Jp = blocks
            dc, dp = _schur_solve_pcg_bucketed(r, Jc, Jp, bucket, scene, lam, cfg, pb)
        else:
            r, Jc, Jp = blocks
            dc, dp = _schur_solve(r, Jc, Jp, scene, lam, cfg, pb)
        cand = _update_scene(scene, dc, dp)
        if cfg.share_calibration:
            cand = _shared_calibration_step(cand, cfg)
        out_c = build(cand)
        new_blocks, bcost_c = out_c[:-1], out_c[-1]
        new_cost = with_prior_cost(cand, bcost_c)
        accept = new_cost < cost
        scene = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, scene
        )
        blocks = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_blocks, blocks
        )
        cost_next = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.lambda_min, cfg.lambda_max,
        )
        rel_decrease = (cost - cost_next) / jnp.maximum(cost, 1e-12)
        converged = accept & (rel_decrease < 1e-6)
        return scene, blocks, lam, cost_next, it + 1, converged

    def cond(carry):
        _, _, lam, _, it, converged = carry
        return (it < cfg.max_iterations) & (~converged) & (lam < cfg.lambda_max)

    scene_f, _, lam_f, cost_f, iters, _ = jax.lax.while_loop(
        cond, body,
        (scene, blocks0, jnp.asarray(cfg.lambda_init, cost0.dtype), cost0,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    if use_band:
        # Undo the banded track regrouping (measurements stay in their sorted
        # order, exactly like the non-banded paths).
        rot = band_plan.row_of_track
        scene_f = dataclasses.replace(
            scene_f,
            points=scene_f.points[rot],
            track_mask=scene_f.track_mask[rot],
            meas_track=mt_orig_sorted,
        )
    return BAResult(scene=scene_f, initial_cost=cost0, final_cost=cost_f, iterations=iters)


def run_ba_with_filtering(
    scene: SceneData,
    reproj_thresholds_px: tuple[float, ...] = (10.0, 5.0, 3.0),
    cfg: BAConfig = BAConfig(),
    priors: RelativePosePriors | None = None,
) -> tuple[SceneData, list[dict]]:
    """Multi-stage BA: optimize, filter landmarks by threshold, repeat.

    Mirrors reference bundle_adjustment.py:292-357 (run_ba_stage_with_filtering
    with e.g. output_reproj_error_thresholds [10, 5, 3] px). Host-level loop
    (stage count is tiny and static).
    """
    import time as _time

    stats = []
    for k, thresh in enumerate(reproj_thresholds_px):
        t_stage = _time.perf_counter()
        stage_cfg = cfg
        # Auto-detect camera-band structure (recomputed per stage — filtering
        # can only shrink spans).
        band_plan = None
        if stage_cfg.bucket_l is not None and stage_cfg.band is None:
            statics, band_plan = auto_band(scene)
            if statics is not None:
                stage_cfg = stage_cfg._replace(band=statics)
        # Mixed precision across stages: bf16 coupling for the bulk stages,
        # full f32 for the FINAL stage so converged accuracy is unaffected —
        # UNLESS the f32 coupling would blow HBM (the 1024-image pipeline's
        # final stage wanted 21.5 GB of 15.75 at C=64 / 137k tracks, r5):
        # then the last stage stays bf16 (the LM accept/reject still guards
        # every step; only the coupling tensor G loses precision).
        if k == len(reproj_thresholds_px) - 1 and cfg.schur_bf16:
            f32_fits = True
            if stage_cfg.band is not None:
                C_b, _, T2_b, _, _ = stage_cfg.band
                D_b = _cam_dim(cfg)
                # ~3 coupling-sized f32 tensors live at once (G, C, build).
                f32_fits = 3 * T2_b * 3 * (2 * C_b * D_b) * 4 < 2.5e9
            if f32_fits:
                stage_cfg = stage_cfg._replace(schur_bf16=False)
        import logging as _logging

        _logging.getLogger("gtsfm_tpu").info(
            "BA stage %d: bucket_l=%s band=%s bf16=%s", k, stage_cfg.bucket_l,
            None if stage_cfg.band is None else stage_cfg.band,
            stage_cfg.schur_bf16,
        )
        t_prep = _time.perf_counter()
        result = lm_optimize(scene, stage_cfg, priors=priors, band_plan=band_plan)
        iters = int(result.iterations)  # host fetch = device-sync barrier
        t_opt = _time.perf_counter()
        scene = result.scene.filter_landmarks(thresh)
        jax.block_until_ready(scene.points)
        t_end = _time.perf_counter()
        stats.append(
            dict(
                threshold=float(thresh),
                initial_cost=float(result.initial_cost),
                final_cost=float(result.final_cost),
                iterations=iters,
                tracks=scene.num_tracks(),
                measurements=scene.num_measurements(),
                # Wall breakdown (VERDICT r3 item 2: reconcile e2e BA wall
                # time with kernel iters/s): band-detect/prep, the LM loop
                # itself (includes any compile on the first stage at a new
                # shape), and the landmark filter + re-pad.
                wall_prep_sec=t_prep - t_stage,
                wall_lm_sec=t_opt - t_prep,
                wall_filter_sec=t_end - t_opt,
                lm_iters_per_sec=(
                    iters / (t_opt - t_prep) if t_opt > t_prep else 0.0
                ),
            )
        )
    return scene, stats
