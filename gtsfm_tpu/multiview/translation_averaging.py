"""1dSFM translation averaging: batched MFAS outlier rejection + robust
Gauss-Newton translation recovery.

TPU-native replacement for the reference's TranslationAveraging1DSFM
(gtsfm/averaging/translation/averaging_1dsfm.py:68-433) which calls GTSAM's
C++ MFAS per projection direction in a Python loop and then GTSAM
TranslationRecovery (LM over Unit3 chordal factors, sigma=0.01, Huber 1.345).

Here the reference's "MFAS x 2000 directions" C++ hot loop (SURVEY.md 3.2)
becomes ONE vmapped kernel: every projection direction runs the greedy
minimum-feedback-arc-set ordering in parallel lanes; per-direction outlier
weights are averaged exactly like averaging_1dsfm.py:194-256 and edges with
mean relative outlier weight >= 0.125 (OUTLIER_WEIGHT_THRESHOLD) are dropped.

Translation recovery reuses this framework's GN/LM pattern (matrix-free
normal equations over nodes), with the same chordal Unit3 residual, noise
sigma and Huber constant as the reference.

Convention: measurement for edge (i1, i2) is w_i2Ui1 = direction from camera
i2 to camera i1 IN WORLD coordinates, i.e. normalize(wti1 - wti2) — the
reference lifts i2Ui1 with wRi2 the same way (averaging_1dsfm.py run:
w_i2Ui1 = wRi2 * i2Ui1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_PROJECTION_DIRECTIONS = 2000  # reference averaging_1dsfm.py:53
OUTLIER_WEIGHT_THRESHOLD = 0.125  # reference averaging_1dsfm.py:51
NOISE_SIGMA = 0.01  # reference averaging_1dsfm.py:46 (TranslationRecovery)
HUBER_K = 1.345


def mfas_outlier_weights(
    edges: np.ndarray,  # (E, 2)
    w_directions: np.ndarray,  # (E, 3) world-frame unit directions a->b? see below
    num_nodes: int,
    num_projections: int = 512,
    seed: int = 0,
) -> np.ndarray:
    """Mean relative outlier weight per edge over sampled projections.

    w_directions[e] = unit direction of translation for edge e in world frame
    (w_i2Ui1: from node i2 toward node i1; the 1d problem only cares about the
    line, signs handled per projection).
    """
    E = edges.shape[0]
    n = int(num_nodes)
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(num_projections, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    edges_a = jnp.asarray(edges[:, 1], jnp.int32)  # node i2 ("from")
    edges_b = jnp.asarray(edges[:, 0], jnp.int32)  # node i1 ("to")
    proj = jnp.einsum("dk,ek->de", jnp.asarray(dirs), jnp.asarray(w_directions))  # (D, E)

    @jax.jit
    def run_all(proj):
        def one(pw):
            w_abs = jnp.abs(pw)
            u = jnp.where(pw >= 0, edges_a, edges_b)
            v = jnp.where(pw >= 0, edges_b, edges_a)
            # out[i] = sum of w_abs over edges leaving i; in[i] over entering.
            out_w = jax.ops.segment_sum(w_abs, u, num_segments=n)
            in_w = jax.ops.segment_sum(w_abs, v, num_segments=n)

            def body(state, _):
                remaining, net_out, net_in, pos, counter = state
                score = jnp.where(remaining > 0, net_out - net_in, -jnp.inf)
                pick = jnp.argmax(score)
                remaining = remaining.at[pick].set(0.0)
                pos = pos.at[pick].set(counter)
                # Remove pick's edges from remaining nodes' tallies.
                dec_out = jax.ops.segment_sum(
                    jnp.where(v == pick, w_abs, 0.0), u, num_segments=n
                )
                dec_in = jax.ops.segment_sum(
                    jnp.where(u == pick, w_abs, 0.0), v, num_segments=n
                )
                return (remaining, net_out - dec_out, net_in - dec_in, pos, counter + 1), None

            init = (
                jnp.ones(n), out_w, in_w, jnp.zeros(n, jnp.int32), jnp.asarray(0, jnp.int32)
            )
            (remaining, _, _, pos, _), _ = jax.lax.scan(body, init, None, length=n)
            # Edge u->v is a feedback (outlier) edge if pos[u] > pos[v].
            backward = pos[u] > pos[v]
            return jnp.where(backward, w_abs, 0.0)

        return jax.vmap(one)(proj)  # (D, E)

    outlier_w = np.asarray(run_all(proj))  # (D, E)
    proj_abs = np.abs(np.asarray(proj))
    # Reference accumulates outlier weight relative to total projection weight.
    denom = np.maximum(proj_abs.sum(0), 1e-9)
    return outlier_w.sum(0) / denom  # (E,) mean relative outlier weight


class TranslationResult(NamedTuple):
    wti: np.ndarray  # (n, 3)
    valid: np.ndarray  # (n,) bool — nodes constrained by at least one edge
    inlier_edges: np.ndarray  # (E,) bool


@functools.partial(jax.jit, static_argnames=("iters", "num_nodes", "gn_iters"))
def _recover_translations_gn(
    edges_a: jnp.ndarray,
    edges_b: jnp.ndarray,
    u_meas: jnp.ndarray,  # (E, 3) world unit dir from node a toward node b
    w_edge: jnp.ndarray,  # (E,) weights (inlier mask)
    t0: jnp.ndarray,  # (n, 3) init
    num_nodes: int,
    iters: int = 60,
    gn_iters: int = 15,
):
    """Robust alternating least squares on scaled-direction residuals.

    BATA/LUD-style reformulation of the reference's Unit3-chordal LM (which
    oscillates from random inits without trust-region machinery): minimize
      sum_e w_e || (t_b - t_a) - s_e * u_e ||^2,   s_e >= delta
    alternating the closed-form scale s_e = max(<t_b - t_a, u_e>, delta) with
    a CG solve of the weighted graph-Laplacian system in t. Huber IRLS weights
    give the same outlier robustness as the reference's Huber(1.345) kernel.
    Scale gauge: mean edge scale normalized to 1 each sweep.
    """
    n = num_nodes
    delta = 0.05

    def body(t, it):
        d_vec = t[edges_b] - t[edges_a]
        s = jnp.maximum(jnp.sum(d_vec * u_meas, axis=-1), delta)
        # normalize scale gauge: mean live-edge scale -> 1
        s_mean = jnp.sum(s * w_edge) / jnp.maximum(jnp.sum(w_edge), 1e-9)
        s = s / jnp.maximum(s_mean, 1e-9)
        t = t / jnp.maximum(s_mean, 1e-9)
        target = s[:, None] * u_meas
        resid = (t[edges_b] - t[edges_a]) - target
        e = jnp.linalg.norm(resid, axis=-1)
        # Huber IRLS on the (edge-length-normalized) linear residual.
        k = 0.25
        w_rob = jnp.minimum(1.0, k / jnp.maximum(e, 1e-9))
        # First sweeps: plain least squares (let the embedding unfold).
        w_rob = jnp.where(it < iters // 3, 1.0, w_rob)
        w = w_rob * w_edge

        # Solve L t = rhs with L = weighted graph Laplacian (x I3).
        def L_mv(x):
            dx = x[edges_b] - x[edges_a]
            y = w[:, None] * dx
            return (
                jax.ops.segment_sum(y, edges_b, num_segments=n)
                - jax.ops.segment_sum(y, edges_a, num_segments=n)
                + 1e-6 * x
            )

        rhs = (
            jax.ops.segment_sum(w[:, None] * target, edges_b, num_segments=n)
            - jax.ops.segment_sum(w[:, None] * target, edges_a, num_segments=n)
        )
        deg = (
            jax.ops.segment_sum(w, edges_a, num_segments=n)
            + jax.ops.segment_sum(w, edges_b, num_segments=n)
            + 1e-6
        )

        def pc(x):
            return x / deg[:, None]

        x = t  # warm start from current embedding
        rr = rhs - L_mv(x)
        z = pc(rr)
        p = z
        rz = jnp.sum(rr * z)

        def cg_body(c, _):
            x, rr, z, p, rz = c
            Lp = L_mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Lp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Lp
            z = pc(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, z, z + beta * p, rz_new), None

        (x, *_), _ = jax.lax.scan(cg_body, (x, rr, z, p, rz), None, length=40)
        x = x - jnp.mean(x, axis=0, keepdims=True)
        return x, None

    t, _ = jax.lax.scan(body, t0, jnp.arange(iters))

    # Phase 2: damped Gauss-Newton polish on the true chordal direction cost
    # (converges quadratically from the ALS embedding; this is the reference's
    # TranslationRecovery LM, warm-started so no trust-region logic is needed).
    def gn_body(t, _):
        d_vec = t[edges_b] - t[edges_a]
        dn = jnp.maximum(jnp.linalg.norm(d_vec, axis=-1, keepdims=True), 1e-9)
        d = d_vec / dn
        r = (d - u_meas) / NOISE_SIGMA
        e = jnp.linalg.norm(r, axis=-1)
        w_rob = jnp.minimum(1.0, HUBER_K / jnp.maximum(e, 1e-9)) * w_edge
        P = (jnp.eye(3) - jnp.einsum("ei,ej->eij", d, d)) / (dn[..., None] * NOISE_SIGMA)
        JtJ_e = jnp.einsum("eki,ekj->eij", P, P) * w_rob[:, None, None]
        Jtr_e = jnp.einsum("eki,ek->ei", P, r) * w_rob[:, None]
        Hd = (
            jax.ops.segment_sum(JtJ_e, edges_a, num_segments=n)
            + jax.ops.segment_sum(JtJ_e, edges_b, num_segments=n)
        )
        lam = 1e-3
        Hd_damped = Hd + lam * Hd * jnp.eye(3) + 1e-8 * jnp.eye(3)
        g = (
            jax.ops.segment_sum(Jtr_e, edges_b, num_segments=n)
            - jax.ops.segment_sum(Jtr_e, edges_a, num_segments=n)
        )

        def H_mv(x):
            dx = x[edges_b] - x[edges_a]
            y = jnp.einsum("eij,ej->ei", JtJ_e, dx)
            base = (
                jax.ops.segment_sum(y, edges_b, num_segments=n)
                - jax.ops.segment_sum(y, edges_a, num_segments=n)
            )
            # add LM damping consistent with Hd_damped's extra diagonal
            extra = jnp.einsum(
                "nij,nj->ni", lam * Hd * jnp.eye(3) + 1e-8 * jnp.eye(3), x
            )
            return base + extra

        Minv = jnp.linalg.inv(Hd_damped)

        def pc(x):
            return jnp.einsum("nij,nj->ni", Minv, x)

        b = -g
        x = jnp.zeros_like(b)
        rr = b - H_mv(x)
        z = pc(rr)
        p = z
        rz = jnp.sum(rr * z)

        def cg_body(c, _):
            x, rr, z, p, rz = c
            Hp = H_mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = pc(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, z, z + beta * p, rz_new), None

        (x, *_), _ = jax.lax.scan(cg_body, (x, rr, z, p, rz), None, length=40)
        x = x - jnp.mean(x, axis=0, keepdims=True)
        return t + x, None

    t, _ = jax.lax.scan(gn_body, t, None, length=gn_iters)
    return t


MAX_TRACK_MEASUREMENTS_PER_CAMERA = 12  # reference averaging_1dsfm.py:56-58
MIN_TRACK_LEN_FOR_AVERAGING = 3


def select_tracks_for_averaging(
    cam_idx: np.ndarray,  # (T, L) int, per-track measurement cameras
    track_mask: np.ndarray,  # (T, L) validity
    num_images: int,
    meas_per_camera: int = MAX_TRACK_MEASUREMENTS_PER_CAMERA,
) -> np.ndarray:
    """Greedy cover (reference _select_tracks_for_averaging :273): pick long
    tracks until every camera is covered by ~meas_per_camera track
    measurements. Returns selected track indices."""
    lengths = track_mask.sum(-1)
    order = np.argsort(-lengths)
    need = np.full(num_images, meas_per_camera, np.int64)
    selected = []
    for t in order:
        if lengths[t] < MIN_TRACK_LEN_FOR_AVERAGING:
            break
        cams = cam_idx[t][track_mask[t] > 0]
        if np.any(need[cams] > 0):
            selected.append(t)
            need[cams] -= 1
        if not np.any(need > 0):
            break
    return np.asarray(selected, np.int64)


def run_translation_averaging(
    num_images: int,
    edges: np.ndarray,  # (E, 2) (i1, i2)
    i2Ui1: np.ndarray,  # (E, 3) unit translation dir of i1 in i2 frame
    wRi: np.ndarray,  # (n, 3, 3) global rotations
    num_projections: int = 512,
    seed: int = 0,
    track_cam_idx: np.ndarray | None = None,  # (T, L) optional track cams
    track_rays: np.ndarray | None = None,  # (T, L, 3) unit rays in CAMERA frame
    track_mask: np.ndarray | None = None,  # (T, L)
) -> TranslationResult:
    """Full 1dSFM: lift to world, MFAS inliers, robust recovery.

    When tracks are supplied, selected camera->landmark direction measurements
    join the recovery problem with landmarks as extra unknowns (reference
    averaging_1dsfm.py: track measurements added to TranslationRecovery) —
    they stiffen weakly-connected camera graphs.
    """
    E = edges.shape[0]
    n = num_images
    # Lift: w_i2Ui1 = wRi2 @ i2Ui1 — direction from camera i2 toward camera i1
    # in world frame (t_{i1} - t_{i2} direction).
    w_dirs = np.einsum("eij,ej->ei", np.asarray(wRi)[edges[:, 1]], np.asarray(i2Ui1))

    outlier_w = mfas_outlier_weights(edges, w_dirs, n, num_projections, seed)
    inliers = outlier_w < OUTLIER_WEIGHT_THRESHOLD

    # Nodes touched by inlier edges.
    valid = np.zeros(n, bool)
    valid[edges[inliers, 0]] = True
    valid[edges[inliers, 1]] = True

    # Init: BFS spanning-tree walk over inlier edges with unit lengths
    # (beats the reference's random init — ALS then converges in a few dozen
    # sweeps instead of needing trust-region LM).
    rng = np.random.default_rng(seed + 1)
    t0_np = rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    adj: dict[int, list[tuple[int, np.ndarray]]] = {}
    for k in np.nonzero(inliers)[0]:
        a, b = int(edges[k, 1]), int(edges[k, 0])  # direction a -> b
        d = w_dirs[k].astype(np.float32)
        adj.setdefault(a, []).append((b, d))
        adj.setdefault(b, []).append((a, -d))
    visited = set()
    for root in adj:
        if root in visited:
            continue
        stack = [root]
        visited.add(root)
        while stack:
            cur = stack.pop()
            for nb, d in adj.get(cur, []):
                if nb not in visited:
                    t0_np[nb] = t0_np[cur] + d
                    visited.add(nb)
                    stack.append(nb)
    t0 = jnp.asarray(t0_np)

    # Optional camera->landmark measurements (selected tracks as extra nodes).
    n_total = n
    extra_a, extra_b, extra_u = [], [], []
    if track_cam_idx is not None and track_rays is not None and track_mask is not None:
        sel = select_tracks_for_averaging(track_cam_idx, track_mask, n)
        for s_i, t_idx in enumerate(sel):
            node = n + s_i
            live = np.nonzero(track_mask[t_idx] > 0)[0]
            for l in live:
                cam = int(track_cam_idx[t_idx, l])
                w_dir = np.asarray(wRi)[cam] @ track_rays[t_idx, l]
                nrm = np.linalg.norm(w_dir)
                if nrm < 1e-9:
                    continue
                extra_a.append(cam)
                extra_b.append(node)
                extra_u.append((w_dir / nrm).astype(np.float32))
        n_total = n + len(sel)
        if extra_a:
            t0_np2 = np.zeros((n_total, 3), np.float32)
            t0_np2[:n] = np.asarray(t0)
            # Init landmarks one unit along their first observing ray.
            for a, b, u_ in zip(extra_a, extra_b, extra_u):
                if np.allclose(t0_np2[b], 0):
                    t0_np2[b] = t0_np2[a] + u_
            t0 = jnp.asarray(t0_np2)

    # Edge direction from i2 (a) to i1 (b): u_meas = w_dirs with a=i2, b=i1.
    ea_np = np.concatenate([edges[:, 1], np.asarray(extra_a, np.int64)]).astype(np.int32)
    eb_np = np.concatenate([edges[:, 0], np.asarray(extra_b, np.int64)]).astype(np.int32)
    u_np = np.concatenate(
        [w_dirs.astype(np.float32)]
        + ([np.stack(extra_u)] if extra_u else [])
    )
    w_np = np.concatenate([inliers.astype(np.float32), np.ones(len(extra_a), np.float32)])
    ea = jnp.asarray(ea_np)
    eb = jnp.asarray(eb_np)
    u = jnp.asarray(u_np)
    w_in = jnp.asarray(w_np)
    t = _recover_translations_gn(ea, eb, u, w_in, t0, num_nodes=n_total, iters=150)

    # Second rejection pass: MFAS false negatives show up as gross direction
    # residuals after recovery — drop edges off by > 15 degrees and re-polish
    # (staged filtering, same pattern as the BA reprojection schedule).
    d_vec = np.asarray(t)[edges[:, 0]] - np.asarray(t)[edges[:, 1]]
    d_norm = d_vec / np.maximum(np.linalg.norm(d_vec, axis=-1, keepdims=True), 1e-9)
    ang = np.degrees(np.arccos(np.clip(np.sum(d_norm * w_dirs, -1), -1, 1)))
    inliers = inliers & (ang < 15.0)
    valid = np.zeros(n, bool)
    valid[edges[inliers, 0]] = True
    valid[edges[inliers, 1]] = True
    w2 = jnp.asarray(
        np.concatenate([inliers.astype(np.float32), np.ones(len(extra_a), np.float32)])
    )
    t = _recover_translations_gn(
        ea, eb, u, w2, t, num_nodes=n_total, iters=20, gn_iters=15,
    )
    t = np.asarray(t)[:n]
    t = t - t[valid].mean(0, keepdims=True) if valid.any() else t
    return TranslationResult(wti=t, valid=valid, inlier_edges=inliers)
