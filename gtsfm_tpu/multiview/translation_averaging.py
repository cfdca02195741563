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



def sample_projection_directions(
    measurements: np.ndarray,  # (M, 3) unit directions
    num_samples: int,
    method: str = "uniform",
    seed: int = 0,
) -> np.ndarray:
    """Projection directions for the 1dSFM MFAS sweeps (reference
    TranslationAveraging1DSFM.__sample_projection_directions,
    averaging_1dsfm.py:105-130 + utils/sampling.py):

      uniform       isotropic Gaussian normalized to the sphere (the
                    reference's default SAMPLE_WITH_UNIFORM_DENSITY)
      measurements  directions drawn from the measurement set itself
                    (SAMPLE_INPUT_MEASUREMENTS)
      kde           Gaussian KDE fit to the measurements in spherical
                    coordinates, sampled (SAMPLE_WITH_INPUT_DENSITY)
      mixed         half uniform + half measurements: covers both the global
                    axes and the directions where the data actually lives
    """
    rng = np.random.default_rng(seed)
    m = np.asarray(measurements, np.float64)

    def uniform(k):
        d = rng.normal(size=(k, 3))
        return d / np.linalg.norm(d, axis=-1, keepdims=True)

    def from_measurements(k):
        if m.shape[0] == 0:
            return uniform(k)
        k_eff = min(k, m.shape[0])
        idx = rng.choice(m.shape[0], k_eff, replace=False)
        out = m[idx]
        if k_eff < k:
            out = np.concatenate([out, uniform(k - k_eff)])
        return out

    if method == "uniform":
        dirs = uniform(num_samples)
    elif method == "measurements":
        dirs = from_measurements(num_samples)
    elif method == "kde":
        if m.shape[0] < 4:
            dirs = uniform(num_samples)
        else:
            from scipy import stats

            sub = m[rng.choice(m.shape[0], min(m.shape[0], 2000), replace=False)]
            theta = np.arccos(np.clip(sub[:, 2], -1.0, 1.0))
            phi = np.arctan2(sub[:, 1], sub[:, 0])
            try:
                kde = stats.gaussian_kde(np.stack([theta, phi]))
                th, ph = kde.resample(num_samples, seed=rng)
                dirs = np.stack(
                    [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], -1
                )
            except np.linalg.LinAlgError:  # degenerate (collinear) set
                dirs = uniform(num_samples)
    elif method == "mixed":
        half = num_samples // 2
        dirs = np.concatenate([uniform(num_samples - half), from_measurements(half)])
    else:
        raise ValueError(f"unknown projection sampling method {method}")
    dirs = np.asarray(dirs, np.float32)
    return dirs / np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)


def mfas_outlier_weights(
    edges: np.ndarray,  # (E, 2)
    w_directions: np.ndarray,  # (E, 3) world-frame unit directions a->b? see below
    num_nodes: int,
    num_projections: int = 512,
    seed: int = 0,
    sampling_method: str = "uniform",
) -> np.ndarray:
    """Mean relative outlier weight per edge over sampled projections.

    w_directions[e] = unit direction of translation for edge e in world frame
    (w_i2Ui1: from node i2 toward node i1; the 1d problem only cares about the
    line, signs handled per projection).
    """
    E = edges.shape[0]
    n = int(num_nodes)
    dirs = sample_projection_directions(
        w_directions, num_projections, method=sampling_method, seed=seed
    )

    edges_a = jnp.asarray(edges[:, 1], jnp.int32)  # node i2 ("from")
    edges_b = jnp.asarray(edges[:, 0], jnp.int32)  # node i1 ("to")
    proj = jnp.einsum("dk,ek->de", jnp.asarray(dirs), jnp.asarray(w_directions))  # (D, E)

    # Dense per-projection adjacency A[d, i, j] = weight of directed edge
    # i->j: built ONCE per projection with two (n, E)(E, n) MXU matmuls
    # against fixed endpoint one-hots; the greedy ordering scan then updates
    # node tallies by reading pick's row/column — O(n) per step instead of
    # re-scanning all E edges (the edge-scan form moved ~n*E*D floats per
    # sweep and was ~20x slower at 512 cams / 5k edges / 512 projections).
    Oa = jax.nn.one_hot(edges_a, n, dtype=proj.dtype)  # (E, n)
    Ob = jax.nn.one_hot(edges_b, n, dtype=proj.dtype)

    # All big operands arrive as ARGUMENTS (not trace-time closure constants:
    # the (E, n) one-hots would be baked into the HLO as literals, whose
    # serialized size broke remote compilation at 2048 cams).
    @jax.jit
    def run_chunk(proj_chunk, Oa, Ob, edges_a, edges_b):
        w_abs = jnp.abs(proj_chunk)  # (Dc, E)
        s_pos = jnp.where(proj_chunk >= 0, w_abs, 0.0)
        s_neg = w_abs - s_pos
        u = jnp.where(proj_chunk >= 0, edges_a[None], edges_b[None])  # (Dc, E)
        v = jnp.where(proj_chunk >= 0, edges_b[None], edges_a[None])

        def build(s):
            sp, sn = s
            return (Oa * sp[:, None]).T @ Ob + (Ob * sn[:, None]).T @ Oa

        A = jax.lax.map(build, (s_pos, s_neg))  # (Dc, n, n)
        net0 = jnp.sum(A, axis=2) - jnp.sum(A, axis=1)  # out - in per node
        # One gather per greedy step instead of two: the net-tally update
        # only ever reads (row - col) of A, i.e. one row of B = A^T - A.
        B = A - jnp.swapaxes(A, -1, -2)  # (Dc, n, n); B[p, q] = A[p,q]-A[q,p]
        Dc = proj_chunk.shape[0]

        def body(state, counter):
            remaining, net, pos = state
            score = jnp.where(remaining > 0, net, -jnp.inf)
            pick = jnp.argmax(score, axis=-1)  # (Dc,)
            oh = jax.nn.one_hot(pick, n, dtype=remaining.dtype)
            remaining = remaining * (1.0 - oh)
            pos = jnp.where(oh > 0, counter, pos)
            delta = jnp.take_along_axis(B, pick[:, None, None], axis=1)[:, 0, :]
            net = net + delta
            return (remaining, net, pos), None

        init = (jnp.ones((Dc, n), proj.dtype), net0, jnp.zeros((Dc, n), jnp.int32))
        (remaining, _, pos), _ = jax.lax.scan(body, init, jnp.arange(n, dtype=jnp.int32))
        pos_u = jnp.take_along_axis(pos, u, axis=1)
        pos_v = jnp.take_along_axis(pos, v, axis=1)
        return jnp.where(pos_u > pos_v, w_abs, 0.0)

    # Chunk the projections to bound the dense adjacency's memory (A + B =
    # 2 Dc n^2 floats; 2^29-element budget = 2 GB for both). Fewer chunks
    # matter more than smaller ones: every extra chunk re-runs the full
    # n-step sequential greedy scan (the 4-chunk layout at 1024 cams cost
    # 4x the steps of the single-chunk 512-cam case — superlinear wall).
    chunk = max(1, min(num_projections, int(2**28 // max(n * n, 1)) or 1))
    outs = []
    for s in range(0, num_projections, chunk):
        outs.append(np.asarray(run_chunk(
            proj[s : s + chunk], Oa, Ob, edges_a, edges_b
        )))
    outlier_w = np.concatenate(outs, axis=0)  # (D, E)
    proj_abs = np.abs(np.asarray(proj))
    # Reference accumulates outlier weight relative to total projection weight.
    denom = np.maximum(proj_abs.sum(0), 1e-9)
    return outlier_w.sum(0) / denom  # (E,) mean relative outlier weight


class TranslationResult(NamedTuple):
    wti: np.ndarray  # (n, 3)
    valid: np.ndarray  # (n,) bool — nodes constrained by at least one edge
    inlier_edges: np.ndarray  # (E,) bool


@functools.partial(
    jax.jit, static_argnames=("iters", "num_nodes", "gn_iters", "normalize_gauge")
)
def _recover_translations_gn(
    edges_a: jnp.ndarray,
    edges_b: jnp.ndarray,
    u_meas: jnp.ndarray,  # (E, 3) world unit dir from node a toward node b
    w_edge: jnp.ndarray,  # (E,) weights (inlier mask)
    t0: jnp.ndarray,  # (n, 3) init
    num_nodes: int,
    iters: int = 60,
    gn_iters: int = 15,
    is_metric: jnp.ndarray | None = None,  # (E,) {0,1}: u_meas is a FULL displacement
    sigma_e: jnp.ndarray | None = None,  # (E,) per-edge noise sigma
    normalize_gauge: bool = True,
):
    """Robust alternating least squares on scaled-direction residuals.

    BATA/LUD-style reformulation of the reference's Unit3-chordal LM (which
    oscillates from random inits without trust-region machinery): minimize
      sum_e w_e || (t_b - t_a) - s_e * u_e ||^2,   s_e >= delta
    alternating the closed-form scale s_e = max(<t_b - t_a, u_e>, delta) with
    a CG solve of the weighted graph-Laplacian system in t. Huber IRLS weights
    give the same outlier robustness as the reference's Huber(1.345) kernel.
    Scale gauge: mean edge scale normalized to 1 each sweep.

    Metric edges (``is_metric``=1, e.g. rig calibration / lidar priors —
    reference gtsam BinaryMeasurementPoint3 priors in rig_1dsfm.py:25) pin the
    FULL displacement t_b - t_a = u_e: their scale is fixed at 1 and they fix
    the global scale gauge (set ``normalize_gauge=False`` when present).
    """
    n = num_nodes
    delta = 0.05
    if is_metric is None:
        is_metric = jnp.zeros(u_meas.shape[0], u_meas.dtype)
    if sigma_e is None:
        sigma_e = jnp.full(u_meas.shape[0], NOISE_SIGMA, u_meas.dtype)
    # Relative information weights (1 for standard direction edges).
    w_sigma = (NOISE_SIGMA / sigma_e) ** 2

    def body(t, it):
        d_vec = t[edges_b] - t[edges_a]
        s = jnp.maximum(jnp.sum(d_vec * u_meas, axis=-1), delta)
        s = jnp.where(is_metric > 0, 1.0, s)
        if normalize_gauge:
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
        w = w_rob * w_edge * w_sigma

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
        sig = sigma_e[:, None]
        r_dir = (d - u_meas) / sig
        r_met = (d_vec - u_meas) / sig
        r = jnp.where(is_metric[:, None] > 0, r_met, r_dir)
        e = jnp.linalg.norm(r, axis=-1)
        w_rob = jnp.minimum(1.0, HUBER_K / jnp.maximum(e, 1e-9)) * w_edge
        P_dir = (jnp.eye(3) - jnp.einsum("ei,ej->eij", d, d)) / (dn[..., None] * sig[..., None])
        P_met = jnp.eye(3) / sig[..., None]
        P = jnp.where(is_metric[:, None, None] > 0, P_met, P_dir)
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
    sampling_method: str = "uniform",
    track_cam_idx: np.ndarray | None = None,  # (T, L) optional track cams
    track_rays: np.ndarray | None = None,  # (T, L, 3) unit rays in CAMERA frame
    track_mask: np.ndarray | None = None,  # (T, L)
    prior_edges: np.ndarray | None = None,  # (Q, 2) (i1, i2) metric prior edges
    prior_disp: np.ndarray | None = None,  # (Q, 3) world-frame t_i1 - t_i2
    prior_sigma: np.ndarray | None = None,  # (Q,) noise sigma per prior
) -> TranslationResult:
    """Full 1dSFM: lift to world, MFAS inliers, robust recovery.

    When tracks are supplied, selected camera->landmark direction measurements
    join the recovery problem with landmarks as extra unknowns (reference
    averaging_1dsfm.py: track measurements added to TranslationRecovery) —
    they stiffen weakly-connected camera graphs.

    Metric priors (world-frame relative POSITION measurements, the reference's
    BinaryMeasurementsPoint3 from rig calibration / lidar odometry) join the
    recovery with full-displacement residuals and fix the scale gauge.
    """
    E = edges.shape[0]
    n = num_images
    # Lift: w_i2Ui1 = wRi2 @ i2Ui1 — direction from camera i2 toward camera i1
    # in world frame (t_{i1} - t_{i2} direction).
    w_dirs = np.einsum("eij,ej->ei", np.asarray(wRi)[edges[:, 1]], np.asarray(i2Ui1))

    outlier_w = mfas_outlier_weights(
        edges, w_dirs, n, num_projections, seed, sampling_method=sampling_method
    )
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
    has_priors = prior_edges is not None and len(prior_edges) > 0
    if has_priors:
        for q in range(len(prior_edges)):
            i1, i2 = int(prior_edges[q, 0]), int(prior_edges[q, 1])
            d = prior_disp[q].astype(np.float32)  # t_i1 - t_i2
            adj.setdefault(i2, []).append((i1, d))
            adj.setdefault(i1, []).append((i2, -d))
            valid[i1] = valid[i2] = True
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
    n_pri = len(prior_edges) if has_priors else 0
    ea_np = np.concatenate(
        [edges[:, 1], np.asarray(extra_a, np.int64)]
        + ([prior_edges[:, 1]] if has_priors else [])
    ).astype(np.int32)
    eb_np = np.concatenate(
        [edges[:, 0], np.asarray(extra_b, np.int64)]
        + ([prior_edges[:, 0]] if has_priors else [])
    ).astype(np.int32)
    u_np = np.concatenate(
        [w_dirs.astype(np.float32)]
        + ([np.stack(extra_u)] if extra_u else [])
        + ([prior_disp.astype(np.float32)] if has_priors else [])
    )
    w_np = np.concatenate(
        [inliers.astype(np.float32), np.ones(len(extra_a) + n_pri, np.float32)]
    )
    is_metric_np = np.zeros(len(ea_np), np.float32)
    sigma_np = np.full(len(ea_np), NOISE_SIGMA, np.float32)
    if has_priors:
        is_metric_np[-n_pri:] = 1.0
        sigma_np[-n_pri:] = np.asarray(prior_sigma, np.float32)
    ea = jnp.asarray(ea_np)
    eb = jnp.asarray(eb_np)
    u = jnp.asarray(u_np)
    w_in = jnp.asarray(w_np)
    is_metric = jnp.asarray(is_metric_np)
    sig_e = jnp.asarray(sigma_np)
    t = _recover_translations_gn(
        ea, eb, u, w_in, t0, num_nodes=n_total, iters=150,
        is_metric=is_metric, sigma_e=sig_e, normalize_gauge=not has_priors,
    )

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
        np.concatenate(
            [inliers.astype(np.float32), np.ones(len(extra_a) + n_pri, np.float32)]
        )
    )
    t = _recover_translations_gn(
        ea, eb, u, w2, t, num_nodes=n_total, iters=20, gn_iters=15,
        is_metric=is_metric, sigma_e=sig_e, normalize_gauge=not has_priors,
    )
    t = np.asarray(t)[:n]
    t = t - t[valid].mean(0, keepdims=True) if valid.any() else t
    return TranslationResult(wti=t, valid=valid, inlier_edges=inliers)


# Hilti rig layout (reference rig_1dsfm.py:25 RigTranslationAveraging1DSFM).
NUM_CAMERAS_IN_RIG = 5
BODY_FRAME_CAMERA = 2
VALID_HARD_CONSTRAINT_EDGES = ((0, 2), (1, 2), (2, 3), (2, 4))


def run_rig_translation_averaging(
    num_images: int,
    edges: np.ndarray,
    i2Ui1: np.ndarray,
    wRi: np.ndarray,
    relative_pose_priors: dict,
    num_cams_in_rig: int = NUM_CAMERAS_IN_RIG,
    body_cam: int = BODY_FRAME_CAMERA,
    **kwargs,
) -> TranslationResult:
    """Rig variant of 1dSFM (reference rig_1dsfm.py:25): converts relative
    Pose3 priors to world-frame relative Point3 priors before recovery.

      * HARD priors (rigid rig calibration) are kept only on the reference's
        whitelist of intra-rig edges {(0,2),(1,2),(2,3),(2,4)} (camera index
        within rig) and get a near-constrained noise model.
      * SOFT priors (lidar odometry) are collapsed to one prior between the
        BODY_FRAME_CAMERA nodes of the two rigs, sigma = 1e-2.

    ``relative_pose_priors``: {(i1, i2): PosePrior} where the prior stores
    i1Ti2 (wRi=i1Ri2, wti=i1ti2 — position of camera i2 in camera i1's frame).
    """
    from gtsfm_tpu.common.pose_prior import PosePriorType

    R = num_cams_in_rig
    wRi_np = np.asarray(wRi)
    pe, pd, ps = [], [], []
    added = set()
    for (i1, i2), p in relative_pose_priors.items():
        # World displacement of camera i2 relative to i1:
        # w(t_i2 - t_i1) = wRi1 @ i1ti2. A prior row (r0, r1) constrains
        # t_r0 - t_r1 = disp, so store rows as (i2, i1).
        w_disp_i2_minus_i1 = wRi_np[i1] @ np.asarray(p.wti)
        if p.type == PosePriorType.HARD_CONSTRAINT:
            c1, c2 = i1 % R, i2 % R
            if (c1, c2) in VALID_HARD_CONSTRAINT_EDGES or (c2, c1) in VALID_HARD_CONSTRAINT_EDGES:
                pe.append((i2, i1))  # edge rows are (i1, i2) of the MEASURED pair
                pd.append(w_disp_i2_minus_i1)
                ps.append(1e-3)
                added.add((i1, i2))
        else:
            r1, r2 = i1 // R, i2 // R
            b1, b2 = r1 * R + body_cam, r2 * R + body_cam
            if (b1, b2) in added:
                continue
            added.add((b1, b2))
            pe.append((i2, i1))
            pd.append(w_disp_i2_minus_i1)
            ps.append(1e-2)
    if pe:
        kwargs["prior_edges"] = np.asarray(pe, np.int64)
        kwargs["prior_disp"] = np.stack(pd).astype(np.float32)
        kwargs["prior_sigma"] = np.asarray(ps, np.float32)
    return run_translation_averaging(num_images, edges, i2Ui1, wRi, **kwargs)
