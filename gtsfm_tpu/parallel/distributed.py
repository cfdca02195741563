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
  * rotation/translation averaging stay REPLICATED — measured decision
    (r4, VERDICT r3 item 7): after the MFAS restructure the whole 1dSFM
    stage is 2.2 s at 512 cams, 5.0 s at 1024, 13.8 s at 2048 (~10
    edges/cam, 512 projections) on one chip — single-digit percent of
    the e2e wall at every measured scale, and the greedy MFAS scan's
    sequential n-step dependency chain would shard poorly (the
    projections axis is embarrassingly parallel, but one chip already
    covers 512 projections in one fused program).

Compiled-step caching: every shard_map program is built by a module-level
``functools.lru_cache`` factory keyed on (mesh, cfg, statics) and wrapped in
``jax.jit``, so an LM loop re-dispatches ONE compiled executable per
iteration instead of re-tracing the step — and the (sort, bucket, band
regroup) prologue is hoisted out of the loop entirely
(_tracksharded_prologue / _banded_prologue, computed once per LM stage).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common.scene import SceneData
from gtsfm_tpu.ops import ransac
from gtsfm_tpu.parallel import multihost


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def _cam_free_of(sc: SceneData) -> jnp.ndarray:
    """Gauge mask: first live camera's pose frozen (computed in-trace)."""
    N = sc.num_cameras_padded
    first_live = jnp.argmax(sc.camera_mask > 0)
    cam_fixed = jax.nn.one_hot(first_live, N, dtype=sc.camera_mask.dtype)
    return (1.0 - cam_fixed) * sc.camera_mask


def _scene_rep_spec() -> SceneData:
    return SceneData(
        wRi=P(), wti=P(), cal=P(), camera_mask=P(), points=P(), track_mask=P(),
        meas_cam=P(), meas_track=P(), meas_uv=P(), meas_mask=P(),
    )


# ---------------------------------------------------------------------------
# Pair-sharded two-view verification (front-end fan-out)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _pair_verify_factory(mesh: Mesh, num_hypotheses: int):
    axis = mesh.axis_names[0]

    @jax.jit
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

    return run


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
    run = _pair_verify_factory(mesh, num_hypotheses)
    thr = jnp.broadcast_to(jnp.asarray(threshold, x1.dtype), (P_total,))
    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis))
    args = multihost.shard_inputs(mesh, in_specs, (keys, x1, x2, mask, thr))
    out = run(*args)
    return multihost.gather_outputs(
        mesh, jax.tree_util.tree_map(lambda _: P(axis), out), out
    )


@functools.lru_cache(maxsize=32)
def _triangulate_factory(mesh: Mesh, reproj_thresh_px: float,
                         max_hypotheses: int):
    """Compiled track-sharded robust triangulation program."""
    from gtsfm_tpu.multiview import data_association as da

    axis = mesh.axis_names[0]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(wRi, wti, cal, cam_idx_l, uv_l, mask_l):
        res = da.triangulate_tracks_robust(
            wRi, wti, cal, cam_idx_l, uv_l, mask_l,
            reproj_thresh_px=reproj_thresh_px, max_hypotheses=max_hypotheses,
        )
        return res

    return run


def track_sharded_triangulate(
    mesh: Mesh,
    wRi: jnp.ndarray,  # (N, 3, 3) — replicated (camera state is tiny)
    wti: jnp.ndarray,
    cal: jnp.ndarray,
    cam_idx: jnp.ndarray,  # (T, L) — T divisible by mesh size
    uv: jnp.ndarray,  # (T, L, 2)
    mask: jnp.ndarray,  # (T, L)
    reproj_thresh_px: float = 10.0,
    max_hypotheses: int = 128,
):
    """Robust track triangulation with the TRACKS axis sharded across the
    mesh (cameras replicated) — the data-association fan-out of the
    reference's Dask triangulation tasks (data_assoc.py) as one shard_map
    with zero mid-stage collectives.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert cam_idx.shape[0] % n_dev == 0, "pad tracks to a multiple of mesh size"
    run = _triangulate_factory(mesh, float(reproj_thresh_px),
                               int(max_hypotheses))
    reps = (P(), P(), P())
    (wRi, wti, cal) = multihost.shard_inputs(mesh, reps, (wRi, wti, cal))
    (cam_idx, uv, mask) = multihost.shard_inputs(
        mesh, (P(axis), P(axis), P(axis)), (cam_idx, uv, mask)
    )
    out = run(wRi, wti, cal, cam_idx, uv, mask)
    return multihost.gather_outputs(
        mesh, jax.tree_util.tree_map(lambda _: P(axis), out), out
    )


@functools.lru_cache(maxsize=32)
def _image_detect_factory(mesh: Mesh, detect_fn):
    """Compiled per-device detection program, cached on (mesh, detect_fn).

    jit itself caches per input shape, so one factory entry covers every
    shape group; without this cache each call built a fresh closure and
    re-traced/re-compiled the whole per-device program (advisor r4) —
    seconds of compile per call through a remote-TPU tunnel.
    """
    axis = mesh.axis_names[0]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
    )
    def run(imgs_l):
        return jax.lax.map(detect_fn, imgs_l)

    return run


def image_sharded_detect(mesh: Mesh, detect_fn, images: jnp.ndarray):
    """Feature detection with the image batch sharded across the mesh.

    TPU-native replacement for the reference's per-image Dask fan-out of
    detector/descriptor tasks (det_desc_correspondence_generator.py:68).
    Each device runs ``detect_fn`` SEQUENTIALLY over its local images via
    lax.map — keeping the fast un-vmapped per-image program (vmapping the
    gather-heavy SIFT sampler lowers its strided samples to a slower
    general gather on TPU: 39.7 vs 19.8 ms/img at 760x512, PERF.md r3) —
    while the batch axis parallelizes across devices.

    images: (B, H, W) shape-uniform grayscale stack, B % mesh size == 0.
    Returns the detect_fn output pytree with a leading (B, ...) axis.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert images.shape[0] % n_dev == 0, "pad images to a multiple of mesh size"

    run = _image_detect_factory(mesh, detect_fn)
    (imgs,) = multihost.shard_inputs(mesh, (P(axis),), (images,))
    out = run(imgs)
    return multihost.gather_outputs(
        mesh, jax.tree_util.tree_map(lambda _: P(axis), out), out
    )


# ---------------------------------------------------------------------------
# Prior blocks (between factors), replicated
# ---------------------------------------------------------------------------


def _make_prior_blocks(scene: SceneData, priors, cfg: ba.BAConfig):
    """Sliced between-factor blocks (replicated; reference _between_factors).
    Returns (rp, Ja, Jb, ea, eb) with Jacobians cut to the live camera width."""
    cam_free = _cam_free_of(scene)
    rp, Ja, Jb = ba._prior_blocks(scene, priors, cam_free)
    Dk = ba._cam_dim(cfg)
    return (rp, Ja[..., :Dk], Jb[..., :Dk], priors.edges_a, priors.edges_b)


# ---------------------------------------------------------------------------
# TRACK-sharded bucketed GN step (one dense-reduction psum per step)
# ---------------------------------------------------------------------------


def _tracksharded_prologue(scene: SceneData, bucket_l: int):
    """Sort measurements by (track, cam) + build the (T, L) bucket — layout
    work shared by every LM iteration (measurement indices never change
    inside a stage, only camera/point VALUES do)."""
    N = scene.num_cameras_padded
    T = scene.num_tracks_padded
    sort_track = jnp.where(scene.meas_mask > 0, scene.meas_track, T)
    order = jnp.argsort(sort_track * N + scene.meas_cam)
    sc_sorted = dataclasses.replace(
        scene,
        meas_cam=scene.meas_cam[order], meas_track=scene.meas_track[order],
        meas_uv=scene.meas_uv[order], meas_mask=scene.meas_mask[order],
    )
    bucket = ba._make_bucket(sc_sorted, bucket_l)
    return sc_sorted, bucket


@functools.lru_cache(maxsize=32)
def _tracksharded_core_factory(mesh: Mesh, cfg: ba.BAConfig, has_pb: bool):
    axis = mesh.axis_names[0]
    bucket_spec = ba._Bucket(cam_b=P(axis), uv_b=P(axis), bmask=P(axis), onehot=P(axis))
    pb_spec = tuple(P() for _ in range(5)) if has_pb else None

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(bucket_spec, _scene_rep_spec(), P(axis), P(axis), P(), pb_spec),
        out_specs=(P(), P(axis)),
    )
    def step(bkt, sc, pts, tmask, lam_arr, pb_rep):
        N = sc.num_cameras_padded
        D = ba._cam_dim(cfg)
        cam_free = _cam_free_of(sc)
        Tl, L = bkt.bmask.shape
        r, Jc, Jp, _ = ba._build_blocks_bucketed(
            sc, bkt, cfg, cam_free, points=pts, track_mask=tmask
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

        if pb_rep is not None:
            # Between-factor priors: replicated fold into the reduced system
            # (diagonal blocks + gradient), cross blocks added to dense S.
            Hcc, v = (lambda hb: (hb[0], hb[1].reshape(-1)))(
                ba._apply_prior_blocks_to_normal_eq(Hcc, v.reshape(N, D), pb_rep, N)
            )
        Hcc_d = Hcc + (lam_v * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
        idx = jnp.arange(N)
        S = jnp.zeros((N, D, N, D), r.dtype).at[idx, :, idx, :].set(Hcc_d)
        if pb_rep is not None:
            rp_, Ja_, Jb_, ea_, eb_ = pb_rep
            cross = jnp.einsum("eki,ekj->eij", Ja_, Jb_)
            S = S.at[ea_, :, eb_, :].add(cross)
            S = S.at[eb_, :, ea_, :].add(jnp.swapaxes(cross, -1, -2))
        S = S.reshape(N * D, N * D) - S_red
        S = S + jnp.diag((jnp.diagonal(S) <= 1e-7).astype(S.dtype))
        Lf = jax.scipy.linalg.cho_factor(S, lower=True)
        dc = jax.scipy.linalg.cho_solve(Lf, v).reshape(N, D)

        # Local back-substitution for this shard's points.
        dp_l = jnp.einsum(
            "tij,tj->ti", Hpp_inv, bp - jnp.einsum("tin,n->ti", G, dc.reshape(-1))
        )
        return dc, dp_l

    return step


def _tracksharded_apply(mesh, sc_sorted, bucket, lam, cfg, pb):
    axis = mesh.axis_names[0]
    step = _tracksharded_core_factory(mesh, cfg, pb is not None)
    bucket_spec = ba._Bucket(cam_b=P(axis), uv_b=P(axis), bmask=P(axis), onehot=P(axis))
    pb_spec = None if pb is None else tuple(P() for _ in pb)
    in_specs = (bucket_spec, _scene_rep_spec(), P(axis), P(axis), P(), pb_spec)
    args = multihost.shard_inputs(
        mesh, in_specs,
        (bucket, sc_sorted, sc_sorted.points, sc_sorted.track_mask,
         jnp.asarray([lam], sc_sorted.meas_uv.dtype), pb),
    )
    dc, dp = multihost.gather_outputs(mesh, (P(), P(axis)), step(*args))
    R, t, cal, points = _banded_apply_update(
        sc_sorted.wRi, sc_sorted.wti, sc_sorted.cal, sc_sorted.points, dc, dp,
        T2=dp.shape[0], fisheye=sc_sorted.cal.shape[-1] == 9,
    )
    return dataclasses.replace(sc_sorted, wRi=R, wti=t, cal=cal, points=points)


def distributed_ba_gn_step_tracksharded(
    mesh: Mesh,
    scene: SceneData,
    bucket_l: int,
    lam: float = 1e-4,
    cfg: ba.BAConfig = ba.BAConfig(),
    priors: "ba.RelativePosePriors | None" = None,
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
    n_dev = mesh.devices.size
    assert scene.num_tracks_padded % n_dev == 0, "pad tracks to mesh size"
    sc_sorted, bucket = _tracksharded_prologue(scene, bucket_l)
    pb = _make_prior_blocks(sc_sorted, priors, cfg) if priors is not None else None
    return _tracksharded_apply(mesh, sc_sorted, bucket, lam, cfg, pb)


# ---------------------------------------------------------------------------
# Camera-BANDED row-sharded GN step (window-block psum per step)
# ---------------------------------------------------------------------------


def _banded_prologue(scene: SceneData, bucket_l: int, band: tuple,
                     band_plan: "ba.BandPlan", n_dev: int):
    """Banded-row regroup + (track, cam) sort + band bucket + whole-block
    padding to the mesh size — once per LM stage."""
    C_, B_, T2, Tb, K = band
    N = scene.num_cameras_padded
    Wd = 2 * C_
    rot = band_plan.row_of_track
    sc2 = dataclasses.replace(
        scene,
        points=jnp.zeros((T2, 3), scene.points.dtype).at[rot].set(scene.points),
        track_mask=jnp.zeros((T2,), scene.track_mask.dtype).at[rot].set(scene.track_mask),
        meas_track=jnp.clip(rot[scene.meas_track], 0, T2 - 1),
    )
    sort_track = jnp.where(sc2.meas_mask > 0, sc2.meas_track, T2)
    order = jnp.argsort(sort_track * N + sc2.meas_cam)
    sc2 = dataclasses.replace(
        sc2,
        meas_cam=sc2.meas_cam[order], meas_track=sc2.meas_track[order],
        meas_uv=sc2.meas_uv[order], meas_mask=sc2.meas_mask[order],
    )
    bucket = ba._make_band_bucket(sc2, bucket_l, C_, band_plan)

    # Pad whole Tb-row blocks (fully masked, last window) so the row-block
    # axis divides the mesh; padded rows contribute zeros everywhere.
    pad_blocks = (-K) % n_dev
    pad_rows = pad_blocks * Tb
    if pad_blocks:
        L_ = bucket.bmask.shape[1]
        z = lambda a, shp: jnp.concatenate([a, jnp.zeros(shp, a.dtype)], 0)
        bucket = ba._BandBucket(
            cam_b=z(bucket.cam_b, (pad_rows, L_)),
            uv_b=z(bucket.uv_b, (pad_rows, L_, 2)),
            bmask=z(bucket.bmask, (pad_rows, L_)),
            onehot_loc=z(bucket.onehot_loc, (pad_rows, L_, Wd)),
            track_window=jnp.concatenate(
                [bucket.track_window,
                 jnp.full((pad_rows,), B_ - 1, bucket.track_window.dtype)], 0),
            block_window=jnp.concatenate(
                [bucket.block_window,
                 jnp.full((pad_blocks,), B_ - 1, bucket.block_window.dtype)], 0),
        )
    return sc2, bucket, pad_rows


@functools.lru_cache(maxsize=32)
def _banded_core_factory(mesh: Mesh, cfg: ba.BAConfig, band: tuple, has_pb: bool):
    axis = mesh.axis_names[0]
    C_, B_, T2, Tb, K = band
    Wd = 2 * C_
    bucket_spec = ba._BandBucket(
        cam_b=P(axis), uv_b=P(axis), bmask=P(axis), onehot_loc=P(axis),
        track_window=P(axis), block_window=P(axis),
    )
    pb_spec = tuple(P() for _ in range(5)) if has_pb else None

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(bucket_spec, _scene_rep_spec(), P(axis), P(axis), P(), pb_spec),
        out_specs=(P(), P(axis)),
    )
    def step(bkt, sc, pts, tmask, lam_arr, pb_rep):
        N = sc.num_cameras_padded
        D = ba._cam_dim(cfg)
        CD = C_ * D
        cam_free = _cam_free_of(sc)
        T2l, L = bkt.bmask.shape
        Kl = bkt.block_window.shape[0]
        lam_v = lam_arr[0]

        r, Jc, Jp, _ = ba._build_blocks_banded(
            sc, bkt, cfg, cam_free, points=pts, track_mask=tmask
        )
        Jc_b = Jc.reshape(T2l, L, 2, D)
        Jp_b = Jp.reshape(T2l, L, 2, 3)

        # Window-accumulated Hcc/bc on this shard's rows.
        JJ = ba._outer2(Jc, Jc).reshape(T2l * L, D * D)
        Jr = ba._matvec2(Jc, r.reshape(T2l * L, 2))
        JJr = jnp.concatenate([JJ, Jr], -1)
        ohb = bkt.onehot_loc.reshape(Kl, (T2l // Kl) * L, Wd)
        hw_blk = jax.lax.dot_general(
            ohb, JJr.reshape(Kl, (T2l // Kl) * L, D * D + D),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=r.dtype,
        )
        hw_l = jax.ops.segment_sum(
            hw_blk, bkt.block_window, num_segments=B_, indices_are_sorted=True
        )

        # Local point blocks.
        Hpp = ba._outer2(Jp_b, Jp_b).sum(1)
        bp = -ba._matvec2(Jp_b, r.reshape(T2l, L, 2)).sum(1)
        Hpp_d = Hpp + (lam_v * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(ba.PT_DIM)
        Hpp_inv = ba._inv3x3(Hpp_d)

        # Local window coupling + per-window reduction blocks.
        g_dtype = jnp.bfloat16 if cfg.schur_bf16 else r.dtype
        W = ba._outer2(Jp_b.astype(g_dtype), Jc_b.astype(g_dtype))
        cam_loc = jnp.clip(bkt.cam_b - bkt.track_window[:, None] * C_, 0, Wd - 1)
        lane = jnp.arange(Wd, dtype=jnp.int32)
        G4 = jnp.zeros((T2l, 3, Wd, D), g_dtype)
        for l in range(L):
            sel = (cam_loc[:, l, None] == lane[None, :]).astype(g_dtype)
            G4 = G4 + sel[:, None, :, None] * W[:, l, :, None, :]
        G_loc = G4.reshape(T2l, 3, Wd * D)
        C_loc = jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G_loc)
        S_blk = jax.lax.dot_general(
            G_loc.reshape(Kl, (T2l // Kl) * 3, Wd * D),
            C_loc.reshape(Kl, (T2l // Kl) * 3, Wd * D),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=r.dtype,
        )
        S_win_l = jax.ops.segment_sum(
            S_blk, bkt.block_window, num_segments=B_, indices_are_sorted=True
        )

        hb = jnp.einsum("tij,tj->ti", Hpp_inv, bp)
        y_loc = jnp.einsum("tin,ti->tn", G_loc, hb, preferred_element_type=r.dtype)
        y_win_l = jax.ops.segment_sum(
            y_loc, bkt.track_window, num_segments=B_, indices_are_sorted=True
        )

        # THE one collective of the step: window-block accumulations only.
        hw, S_win, y_win = jax.lax.psum((hw_l, S_win_l, y_win_l), axis)

        # Replicated reduced solve (window-block PCG).
        acc = ba._win_overlap_add(
            hw.reshape(B_, Wd * (D * D + D)), B_, C_ * (D * D + D)
        ).reshape((B_ + 1) * C_, D * D + D)[:N]
        Hcc = acc[:, : D * D].reshape(N, D, D)
        bc = -acc[:, D * D:]
        if pb_rep is not None:
            # Replicated between-factor fold (diag + gradient); the (a,b)
            # cross coupling joins the matvec below.
            Hcc, bc = ba._apply_prior_blocks_to_normal_eq(Hcc, bc, pb_rep, N)
        Hcc_d = Hcc + (lam_v * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(D)
        v_rhs = bc - ba._win_overlap_add(y_win, B_, CD)[: N * D].reshape(N, D)

        def window_slices(x_flat):
            ext = jnp.zeros(((B_ + 1) * CD,), x_flat.dtype).at[: N * D].set(x_flat)
            rows = ext.reshape(B_ + 1, CD)
            return jnp.concatenate([rows[:-1], rows[1:]], axis=-1)

        def S_matvec(x):
            xw = window_slices(x.reshape(-1))
            yw = jnp.einsum("wij,wj->wi", S_win, xw)
            red = ba._win_overlap_add(yw, B_, CD)[: N * D].reshape(N, D)
            direct = jnp.einsum("nij,nj->ni", Hcc_d, x)
            if pb_rep is not None:
                direct = direct + ba._prior_cross_matvec(pb_rep, x)
            return direct - red

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
            pSp = jnp.sum(p * Sp)
            alpha = jnp.where(pSp > 1e-20, rz / pSp, 0.0)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            return x, rr, z, z + beta * p, rz_new, it + 1

        def pcg_cond(carry):
            x, rr, z, p, rz, it = carry
            return (it < cfg.pcg_iterations) & (jnp.sum(rr * rr) / denom0 > cfg.pcg_tol**2)

        dc, *_ = jax.lax.while_loop(pcg_cond, pcg_body, (x0, r0, z0, z0, rz0, 0))

        # Local point back-substitution.
        dc_tw = window_slices(dc.reshape(-1))[bkt.track_window]
        Hpc_dc = jnp.einsum("tin,tn->ti", G_loc, dc_tw, preferred_element_type=r.dtype)
        dp_l = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_dc)
        return dc, dp_l

    return step


@functools.partial(jax.jit, static_argnames=("pad_rows",))
def _banded_pad_tracks(points, track_mask, pad_rows: int):
    pts_all = jnp.concatenate(
        [points, jnp.zeros((pad_rows, 3), points.dtype)], 0)
    tmask_all = jnp.concatenate(
        [track_mask, jnp.zeros((pad_rows,), track_mask.dtype)], 0)
    return pts_all, tmask_all


@functools.partial(jax.jit, static_argnames=("T2", "fisheye"))
def _banded_apply_update(wRi, wti, cal, points, dc, dp, T2: int, fisheye: bool):
    """Fused post-step state update (delta application + point add).

    One jitted program instead of a raft of eager primitives: the eager path
    compiled a fresh tiny XLA:CPU executable per op per shape, which is both
    per-iteration dispatch overhead through the TPU tunnel and a crash
    surface for this environment's flaky LLVM JIT (tests/conftest.py note —
    the abort signature was an eager so3_exp compile inside this tail)."""
    dp = dp[:T2]
    if dc.shape[-1] < ba.CAM_DIM:  # frozen calibration: 6-dim camera blocks
        dc = jnp.pad(dc, ((0, 0), (0, ba.CAM_DIM - dc.shape[-1])))
    delta_fn = ba._apply_camera_delta_fisheye if fisheye else ba._apply_camera_delta
    R, t, cal = delta_fn(wRi, wti, cal, dc)
    return R, t, cal, points + dp


def _banded_apply(mesh, sc2, bucket, pad_rows, band, lam, cfg, pb):
    """One banded GN step on the REGROUPED scene layout (prologue already
    applied); returns the updated regrouped scene."""
    axis = mesh.axis_names[0]
    C_, B_, T2, Tb, K = band
    step = _banded_core_factory(mesh, cfg, band, pb is not None)
    pts_all = sc2.points
    tmask_all = sc2.track_mask
    if pad_rows:
        pts_all, tmask_all = _banded_pad_tracks(pts_all, tmask_all, pad_rows)
    bucket_spec = ba._BandBucket(
        cam_b=P(axis), uv_b=P(axis), bmask=P(axis), onehot_loc=P(axis),
        track_window=P(axis), block_window=P(axis),
    )
    pb_spec = None if pb is None else tuple(P() for _ in pb)
    in_specs = (bucket_spec, _scene_rep_spec(), P(axis), P(axis), P(), pb_spec)
    args = multihost.shard_inputs(
        mesh, in_specs,
        (bucket, sc2, pts_all, tmask_all,
         jnp.asarray([lam], sc2.meas_uv.dtype), pb),
    )
    dc, dp = multihost.gather_outputs(mesh, (P(), P(axis)), step(*args))
    R, t, cal, points = _banded_apply_update(
        sc2.wRi, sc2.wti, sc2.cal, sc2.points, dc, dp,
        T2=T2, fisheye=sc2.cal.shape[-1] == 9,
    )
    return dataclasses.replace(sc2, wRi=R, wti=t, cal=cal, points=points)


def _banded_ungroup(sc2: SceneData, band_plan: "ba.BandPlan") -> SceneData:
    """Undo the banded track regrouping (input track layout; measurements
    stay in their sorted order, like the single-device banded path)."""
    rot = band_plan.row_of_track
    return dataclasses.replace(
        sc2,
        points=sc2.points[rot],
        track_mask=sc2.track_mask[rot],
        meas_track=band_plan.old_of_row[
            jnp.clip(sc2.meas_track, 0, band_plan.old_of_row.shape[0] - 1)
        ],
    )


def distributed_ba_gn_step_banded(
    mesh: Mesh,
    scene: SceneData,
    bucket_l: int,
    band: tuple,
    band_plan: "ba.BandPlan",
    lam: float = 1e-4,
    cfg: ba.BAConfig = ba.BAConfig(),
    priors: "ba.RelativePosePriors | None" = None,
) -> SceneData:
    """One damped GN step with camera-BANDED row-sharded Schur reduction —
    the production multi-chip layout for LARGE sequential scenes.

    Each device owns a contiguous slice of banded track rows (whole Tb-row
    blocks) and reduces its coupling into per-window blocks; THE one psum of
    the step moves only the (B, 2CD, 2CD) window reduction blocks plus the
    (B, ...) Hcc/bc/rhs window accumulations over ICI — O(B (2CD)^2) bytes,
    independent of the measurement count and (N/2C)^2 x smaller than
    psumming a dense (ND)^2 reduction. The reduced solve (window-block PCG,
    bundle/ba._schur_solve_pcg_banded's formulation) is replicated; point
    back-substitution stays local to each shard.
    """
    n_dev = mesh.devices.size
    sc2, bucket, pad_rows = _banded_prologue(scene, bucket_l, band, band_plan, n_dev)
    pb = _make_prior_blocks(sc2, priors, cfg) if priors is not None else None
    out = _banded_apply(mesh, sc2, bucket, pad_rows, band, lam, cfg, pb)
    return _banded_ungroup(out, band_plan)


# ---------------------------------------------------------------------------
# Measurement-sharded GN step (psum-Schur matrix-free PCG)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _meas_core_factory(mesh: Mesh, cfg: ba.BAConfig, has_pb: bool):
    axis = mesh.axis_names[0]
    meas_spec = SceneData(
        wRi=P(), wti=P(), cal=P(), camera_mask=P(),
        points=P(), track_mask=P(),
        meas_cam=P(axis), meas_track=P(axis), meas_uv=P(axis), meas_mask=P(axis),
    )
    pb_spec = tuple(P() for _ in range(5)) if has_pb else None

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(meas_spec, P(), pb_spec),
        out_specs=(P(), P()),
    )
    def step(scene_shard: SceneData, lam_arr, pb_rep):
        N = scene_shard.num_cameras_padded
        cam_free = _cam_free_of(scene_shard)
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
        if pb_rep is not None:
            Hcc, bc = ba._apply_prior_blocks_to_normal_eq(Hcc, bc, pb_rep, N)

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
            if pb_rep is not None:
                direct = direct + ba._prior_cross_matvec(pb_rep, x)
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
            pSp = jnp.sum(p * Sp)
            alpha = jnp.where(pSp > 1e-20, rz / pSp, 0.0)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = pc(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            return (x, rr, z, z + beta * p, rz_new), None

        (dc, *_), _ = jax.lax.scan(cg_body, (x, rr, z, p, rz), None, length=cfg.pcg_iterations)
        dp = jnp.einsum("tij,tj->ti", Hpp_inv, bp - Hpc_x(dc))
        return dc, dp

    return step


def distributed_ba_gn_step(
    mesh: Mesh, scene: SceneData, lam: float = 1e-4, cfg: ba.BAConfig = ba.BAConfig(),
    priors: "ba.RelativePosePriors | None" = None,
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

    pb = _make_prior_blocks(scene, priors, cfg) if priors is not None else None
    pb_spec = None if pb is None else tuple(P() for _ in pb)
    step = _meas_core_factory(mesh, cfg, pb is not None)
    meas_spec = SceneData(
        wRi=P(), wti=P(), cal=P(), camera_mask=P(),
        points=P(), track_mask=P(),
        meas_cam=P(axis), meas_track=P(axis), meas_uv=P(axis), meas_mask=P(axis),
    )
    in_specs = (meas_spec, P(), pb_spec)
    args = multihost.shard_inputs(
        mesh, in_specs, (scene, jnp.asarray([lam], scene.meas_uv.dtype), pb)
    )
    dc, dp = multihost.gather_outputs(mesh, (P(), P()), step(*args))
    if dc.shape[-1] < ba.CAM_DIM:  # frozen calibration: 6-dim camera blocks
        dc = jnp.pad(dc, ((0, 0), (0, ba.CAM_DIM - dc.shape[-1])))
    delta_fn = (ba._apply_camera_delta_fisheye if scene.cal.shape[-1] == 9
                else ba._apply_camera_delta)
    R, t, cal = delta_fn(scene.wRi, scene.wti, scene.cal, dc)
    return dataclasses.replace(scene, wRi=R, wti=t, cal=cal, points=scene.points + dp)


# ---------------------------------------------------------------------------
# Full distributed LM loop + multi-stage filtering
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _cost_fn(huber_k: float, robust: bool):
    return jax.jit(lambda s: ba.robust_cost(s, huber_k, robust))


def distributed_lm_optimize(
    mesh: Mesh,
    scene: SceneData,
    cfg: ba.BAConfig = ba.BAConfig(),
    band_plan: "ba.BandPlan | None" = None,
    priors: "ba.RelativePosePriors | None" = None,
) -> tuple[SceneData, dict]:
    """Full distributed LM loop with host-side damping/acceptance — the
    distributed analog of bundle/ba.lm_optimize for problems exceeding one
    chip. Cost evaluation is replicated (cameras/points are small).

    With cfg.band + band_plan set, each iteration is the BANDED row-sharded
    step (one psum of window blocks — the large-scene production layout);
    with cfg.bucket_l alone, the track-sharded bucketed step (one psum of the
    dense reduction); otherwise the measurement-sharded psum-Schur PCG.

    The layout prologue (sort / regroup / bucket / pad) runs ONCE here;
    every iteration re-dispatches one cached compiled step executable.

    Returns (optimized scene, stats dict).
    """
    lam = cfg.lambda_init
    n_dev = mesh.devices.size
    cost_of = _cost_fn(cfg.huber_k, cfg.robust)

    # One-time layout prologue for the chosen step kind.
    band_state = None
    track_state = None
    if cfg.band is not None:
        assert band_plan is not None, "cfg.band requires band_plan"
        sc_work, bucket, pad_rows = _banded_prologue(
            scene, cfg.bucket_l, cfg.band, band_plan, n_dev
        )
        band_state = (bucket, pad_rows)
    elif cfg.bucket_l is not None:
        sc_work, bucket = _tracksharded_prologue(scene, cfg.bucket_l)
        track_state = bucket
    else:
        sc_work = scene

    def total_cost(s):
        c = float(cost_of(s))
        if priors is not None:
            c += float(ba.prior_cost(s, priors))
        return c

    cost = total_cost(sc_work)
    cost0 = cost
    accepted = 0
    for it in range(cfg.max_iterations):
        # Between factors relinearize at the CURRENT camera state each
        # iteration (like the reprojection blocks).
        pb = _make_prior_blocks(sc_work, priors, cfg) if priors is not None else None
        if band_state is not None:
            cand = _banded_apply(
                mesh, sc_work, band_state[0], band_state[1], cfg.band, lam, cfg, pb
            )
        elif track_state is not None:
            cand = _tracksharded_apply(mesh, sc_work, track_state, lam, cfg, pb)
        else:
            cand = distributed_ba_gn_step(mesh, sc_work, lam=lam, cfg=cfg, priors=priors)
        new_cost = total_cost(cand)
        if new_cost < cost:
            sc_work = cand
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
    if band_state is not None:
        sc_work = _banded_ungroup(sc_work, band_plan)
    return sc_work, {
        "initial_cost": cost0, "final_cost": cost,
        "iterations": it + 1, "accepted": accepted,
    }


def run_ba_with_filtering_distributed(
    mesh: Mesh,
    scene: SceneData,
    reproj_thresholds_px: tuple = (10.0, 5.0, 3.0),
    cfg: ba.BAConfig = ba.BAConfig(),
    priors: "ba.RelativePosePriors | None" = None,
) -> tuple[SceneData, list[dict]]:
    """Multi-stage distributed BA: optimize on the mesh, filter landmarks,
    repeat — the distributed analog of bundle/ba.run_ba_with_filtering
    (reference bundle_adjustment.py:292-357 semantics), so the WHOLE back-end
    runs on the cluster like the reference's Dask-delayed BA
    (gtsfm_runner_base.py:379-396), not just the two-view front-end.

    Per stage the banded row-sharded layout is auto-detected (sequential
    scenes); otherwise the track-sharded bucketed layout is used. Padding to
    the mesh size is guaranteed by SceneData's 256-granular buckets for any
    mesh up to 256 devices.
    """
    n_dev = mesh.devices.size
    stats = []
    for k, thresh in enumerate(reproj_thresholds_px):
        stage_cfg = cfg
        if k == len(reproj_thresholds_px) - 1 and cfg.schur_bf16:
            stage_cfg = cfg._replace(schur_bf16=False)
        band_plan = None
        if stage_cfg.bucket_l is not None and stage_cfg.band is None:
            statics, band_plan = ba.auto_band(scene)
            if statics is not None:
                # Whole Tb-row blocks shard across the mesh; the step pads the
                # block axis to the mesh size internally.
                stage_cfg = stage_cfg._replace(band=statics)
        if stage_cfg.band is None and scene.num_tracks_padded % n_dev != 0:
            # Track-sharded layout needs T % n_dev == 0; grow the track pad.
            T_new = ((scene.num_tracks_padded + n_dev - 1) // n_dev) * n_dev
            pad = T_new - scene.num_tracks_padded
            scene = dataclasses.replace(
                scene,
                points=jnp.pad(scene.points, ((0, pad), (0, 0))),
                track_mask=jnp.pad(scene.track_mask, (0, pad)),
            )
        scene, st = distributed_lm_optimize(
            mesh, scene, stage_cfg, band_plan=band_plan, priors=priors
        )
        scene = scene.filter_landmarks(thresh)
        st = dict(st)
        st.update(
            threshold=float(thresh),
            tracks=scene.num_tracks(),
            measurements=scene.num_measurements(),
            devices=int(n_dev),
        )
        stats.append(st)
    return scene, stats
