"""Distributed SPMD stages over a jax.sharding.Mesh.

TPU-native replacement for the reference's Dask distribution (SURVEY.md
section 2.1 "Distributed backend"): instead of client.scatter/submit/gather
over TCP, work is laid out on a device mesh and XLA collectives move data
over ICI:

  * front-end (per-pair fan-out, reference two_view_estimator.py:569-584):
    the pairs axis is sharded across devices — embarrassingly parallel,
    zero collectives except the final gather.
  * bundle adjustment (reference's single-node GTSAM LM,
    bundle_adjustment.py:269): measurements are sharded across devices;
    each device builds Jacobian blocks for its shard and the Schur-complement
    normal-equation blocks are reduced with psum — the "distributed Schur
    reduction over ICI" design from BASELINE.md. Cameras/points are
    replicated (their state is tiny relative to measurements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common.scene import SceneData
from gtsfm_tpu.ops import ransac


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def pair_sharded_verify(
    mesh: Mesh,
    key: jax.Array,
    x1: jnp.ndarray,  # (P, N, 2) normalized coords — P divisible by mesh size
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: jnp.ndarray,
    num_hypotheses: int = 256,
):
    """Two-view RANSAC with the pairs axis sharded across the mesh."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    P_total = x1.shape[0]
    assert P_total % n_dev == 0, "pad pairs to a multiple of mesh size"

    keys = jax.random.split(key, n_dev)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(keys_l, x1_l, x2_l, mask_l, thr_l):
        return ransac.verify_essential_batched(
            keys_l[0], x1_l, x2_l, mask_l, thr_l, num_hypotheses=num_hypotheses
        )

    thr = jnp.broadcast_to(jnp.asarray(threshold, x1.dtype), (P_total,))
    return run(keys, x1, x2, mask, thr)


def distributed_ba_gn_step_tracksharded(
    mesh: Mesh,
    scene: SceneData,
    bucket_l: int,
    lam: float = 1e-4,
    cfg: ba.BAConfig = ba.BAConfig(),
) -> SceneData:
    """One damped GN step with TRACKS sharded across the mesh and the
    scatter-free bucketed Schur assembly per shard.

    Every track's measurements live on one device (the (T, L) bucket layout
    shards on its leading axis), so the whole reduction needs exactly ONE
    psum per step — of (Hcc, bc, S_red, v), a few MB — instead of the
    measurement-sharded path's two collectives per PCG iteration. Hpp and
    the point back-substitution stay fully local to each shard. This is the
    production multi-chip BA layout (ICI traffic ~ O(N^2 D^2), independent
    of the measurement count).
    """
    import dataclasses

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    D = ba._cam_dim(cfg)
    assert T % n_dev == 0, "pad tracks to a multiple of mesh size"

    first_live = jnp.argmax(scene.camera_mask > 0)
    cam_fixed = jax.nn.one_hot(first_live, N, dtype=scene.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * scene.camera_mask

    # Sort + bucket once per step (replicated; cheap relative to the solve).
    sort_track = jnp.where(scene.meas_mask > 0, scene.meas_track, T)
    order = jnp.argsort(sort_track * N + scene.meas_cam)
    sc_sorted = dataclasses.replace(
        scene,
        meas_cam=scene.meas_cam[order], meas_track=scene.meas_track[order],
        meas_uv=scene.meas_uv[order], meas_mask=scene.meas_mask[order],
    )
    bucket = ba._make_bucket(sc_sorted, bucket_l)

    bucket_spec = ba._Bucket(cam_b=P(axis), uv_b=P(axis), bmask=P(axis), onehot=P(axis))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(bucket_spec, P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
    )
    def step(bkt, pts, tmask, lam_arr):
        Tl, L = bkt.bmask.shape
        r, Jc, Jp, _ = ba._build_blocks_bucketed(
            sc_sorted, bkt, cfg, cam_free, points=pts, track_mask=tmask
        )
        Jc_b = Jc.reshape(Tl, L, 2, D)
        Jp_b = Jp.reshape(Tl, L, 2, 3)
        oh2 = bkt.onehot.reshape(Tl * L, N)

        JJ = ba._outer2(Jc, Jc).reshape(Tl * L, D * D)
        Hcc_l = (oh2.T @ JJ).reshape(N, D, D)
        bc_l = -(oh2.T @ ba._matvec2(Jc, r))
        Hpp = ba._outer2(Jp_b, Jp_b).sum(1)  # local tracks only
        bp = -ba._matvec2(Jp_b, r.reshape(Tl, L, 2)).sum(1)

        lam_v = lam_arr[0]
        Hpp_d = Hpp + (lam_v * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(ba.PT_DIM)
        Hpp_inv = ba._inv3x3(Hpp_d)

        W = ba._outer2(Jp_b, Jc_b)
        G = jnp.einsum("tln,tlij->tinj", bkt.onehot, W).reshape(Tl, 3, N * D)
        C = jnp.einsum("tij,tjn->tin", Hpp_inv, G)
        S_red_l = jax.lax.dot_general(
            G.reshape(Tl * 3, N * D), C.reshape(Tl * 3, N * D),
            (((0,), (0,)), ((), ())),
        )
        v_l = bc_l.reshape(-1) - jnp.einsum(
            "tin,ti->n", G, jnp.einsum("tij,tj->ti", Hpp_inv, bp)
        )

        # THE one collective of the step.
        Hcc, S_red, v = jax.lax.psum((Hcc_l, S_red_l, v_l), axis)

        Hcc_d = Hcc + (lam_v * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
        idx = jnp.arange(N)
        S = jnp.zeros((N, D, N, D), r.dtype).at[idx, :, idx, :].set(Hcc_d)
        S = S.reshape(N * D, N * D) - S_red
        S = S + jnp.diag((jnp.diagonal(S) <= 1e-7).astype(S.dtype))
        Lf = jax.scipy.linalg.cho_factor(S, lower=True)
        dc = jax.scipy.linalg.cho_solve(Lf, v).reshape(N, D)

        # Local back-substitution for this shard's points.
        dp_l = jnp.einsum(
            "tij,tj->ti", Hpp_inv, bp - jnp.einsum("tin,n->ti", G, dc.reshape(-1))
        )
        return dc, dp_l

    dc, dp = step(
        bucket, sc_sorted.points, sc_sorted.track_mask,
        jnp.asarray([lam], scene.meas_uv.dtype),
    )
    if dc.shape[-1] < ba.CAM_DIM:  # frozen calibration: 6-dim camera blocks
        dc = jnp.pad(dc, ((0, 0), (0, ba.CAM_DIM - dc.shape[-1])))
    R, t, cal = ba._apply_camera_delta(sc_sorted.wRi, sc_sorted.wti, sc_sorted.cal, dc)
    return dataclasses.replace(
        sc_sorted, wRi=R, wti=t, cal=cal, points=sc_sorted.points + dp
    )


def distributed_lm_optimize(
    mesh: Mesh,
    scene: SceneData,
    cfg: ba.BAConfig = ba.BAConfig(),
) -> tuple[SceneData, dict]:
    """Full distributed LM loop with host-side damping/acceptance — the
    distributed analog of bundle/ba.lm_optimize for problems exceeding one
    chip. Cost evaluation is replicated (cameras/points are small).

    With cfg.bucket_l set, each iteration is the track-sharded bucketed step
    (one psum per step); otherwise the measurement-sharded psum-Schur PCG.

    Returns (optimized scene, stats dict).
    """
    lam = cfg.lambda_init
    cost = float(ba.robust_cost(scene, cfg.huber_k, cfg.robust))
    cost0 = cost
    accepted = 0
    for it in range(cfg.max_iterations):
        if cfg.bucket_l is not None:
            cand = distributed_ba_gn_step_tracksharded(
                mesh, scene, cfg.bucket_l, lam=lam, cfg=cfg
            )
        else:
            cand = distributed_ba_gn_step(mesh, scene, lam=lam, cfg=cfg)
        new_cost = float(ba.robust_cost(cand, cfg.huber_k, cfg.robust))
        if new_cost < cost:
            scene = cand
            rel = (cost - new_cost) / max(cost, 1e-12)
            cost = new_cost
            lam = max(lam * cfg.lambda_down, cfg.lambda_min)
            accepted += 1
            if rel < 1e-6:
                break
        else:
            lam = min(lam * cfg.lambda_up, cfg.lambda_max)
            if lam >= cfg.lambda_max:
                break
    return scene, {
        "initial_cost": cost0, "final_cost": cost,
        "iterations": it + 1, "accepted": accepted,
    }


def distributed_ba_gn_step(
    mesh: Mesh, scene: SceneData, lam: float = 1e-4, cfg: ba.BAConfig = ba.BAConfig()
) -> SceneData:
    """One damped Gauss-Newton BA step with measurement-sharded Jacobians.

    Each device: local residual/Jacobian blocks -> local segment-sums ->
    psum over the mesh (the distributed Schur reduction) -> replicated PCG
    solve -> replicated state update. Returns the updated scene.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    M = scene.num_measurements_padded
    assert M % n_dev == 0, "pad measurements to a multiple of mesh size"

    N = scene.num_cameras_padded

    first_live = jnp.argmax(scene.camera_mask > 0)
    cam_fixed = jax.nn.one_hot(first_live, N, dtype=scene.camera_mask.dtype)
    cam_free = (1.0 - cam_fixed) * scene.camera_mask

    meas_spec = SceneData(
        wRi=P(), wti=P(), cal=P(), camera_mask=P(),
        points=P(), track_mask=P(),
        meas_cam=P(axis), meas_track=P(axis), meas_uv=P(axis), meas_mask=P(axis),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(meas_spec, P()),
        out_specs=(P(), P()),
    )
    def step(scene_shard: SceneData, lam_arr):
        # Local Jacobian blocks on this device's measurement shard.
        r, Jc, Jp, _ = ba._build_blocks(scene_shard, cfg, cam_free)
        mc = scene_shard.meas_cam
        mt = scene_shard.meas_track
        T = scene_shard.num_tracks_padded

        Hcc = jax.lax.psum(
            jax.ops.segment_sum(ba._outer2(Jc, Jc), mc, num_segments=N),
            axis,
        )
        Hpp = jax.lax.psum(
            jax.ops.segment_sum(ba._outer2(Jp, Jp), mt, num_segments=T),
            axis,
        )
        bc = -jax.lax.psum(
            jax.ops.segment_sum(ba._matvec2(Jc, r), mc, num_segments=N),
            axis,
        )
        bp = -jax.lax.psum(
            jax.ops.segment_sum(ba._matvec2(Jp, r), mt, num_segments=T),
            axis,
        )

        lam_v = lam_arr[0]
        Hcc_d = Hcc + (lam_v * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(Jc.shape[-1])
        Hpp_d = Hpp + (lam_v * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(ba.PT_DIM)
        Hpp_inv = ba._inv3x3(Hpp_d)

        # Coupling matvecs need ALL measurements' Jc/Jp — computed locally on
        # the shard then psum'd (each device holds only its blocks).
        def Hpc_x(x):
            v = jnp.einsum("mki,mi->mk", Jc, x[mc])
            return jax.lax.psum(
                jax.ops.segment_sum(ba._matvec2(Jp, v), mt, num_segments=T),
                axis,
            )

        def Hcp_y(y):
            v = jnp.einsum("mki,mi->mk", Jp, y[mt])
            return jax.lax.psum(
                jax.ops.segment_sum(ba._matvec2(Jc, v), mc, num_segments=N),
                axis,
            )

        def S_matvec(x):
            direct = jnp.einsum("nij,nj->ni", Hcc_d, x)
            z = jnp.einsum("tij,tj->ti", Hpp_inv, Hpc_x(x))
            return direct - Hcp_y(z)

        v_rhs = bc - Hcp_y(jnp.einsum("tij,tj->ti", Hpp_inv, bp))
        Minv = jnp.linalg.inv(Hcc_d)

        def pc(x):
            return jnp.einsum("nij,nj->ni", Minv, x)

        x = jnp.zeros_like(v_rhs)
        rr = v_rhs - S_matvec(x)
        z = pc(rr)
        p = z
        rz = jnp.sum(rr * z)

        def cg_body(c, _):
            x, rr, z, p, rz = c
            Sp = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = pc(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, z, z + beta * p, rz_new), None

        (dc, *_), _ = jax.lax.scan(cg_body, (x, rr, z, p, rz), None, length=cfg.pcg_iterations)
        dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_x(dc))
        return dc, dp

    dc, dp = step(scene, jnp.asarray([lam], scene.meas_uv.dtype))
    if dc.shape[-1] < ba.CAM_DIM:  # frozen calibration: 6-dim camera blocks
        dc = jnp.pad(dc, ((0, 0), (0, ba.CAM_DIM - dc.shape[-1])))
    R, t, cal = ba._apply_camera_delta(scene.wRi, scene.wti, scene.cal, dc)
    import dataclasses

    return dataclasses.replace(scene, wRi=R, wti=t, cal=cal, points=scene.points + dp)
