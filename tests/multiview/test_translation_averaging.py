"""1dSFM tests (reference tests/averaging/translation/test_averaging_1dsfm.py
strategy: synthetic graphs, recovered positions match GT up to gauge)."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import alignment
from gtsfm_tpu.multiview import translation_averaging as ta
from tests.multiview.sample_poses import (
    all_pairs_edges, circle_poses, relative_measurements,
)


def centers_match_up_to_sim3(t_est, t_gt, valid, atol):
    s, R, tr = alignment.umeyama_sim3(
        jnp.asarray(t_est[valid], jnp.float32), jnp.asarray(t_gt[valid], jnp.float32)
    )
    aligned = float(s) * np.asarray(t_est[valid]) @ np.asarray(R).T + np.asarray(tr)
    return np.abs(aligned - t_gt[valid]).max() < atol


def test_exact_circle():
    wRi, wti = circle_poses(8)
    edges = all_pairs_edges(8, max_gap=3)
    _, i2Ui1 = relative_measurements(wRi, wti, edges)
    res = ta.run_translation_averaging(8, edges, i2Ui1, wRi, num_projections=128)
    assert res.valid.all()
    assert res.inlier_edges.mean() > 0.9
    assert centers_match_up_to_sim3(res.wti, wti, res.valid, atol=0.05)


def test_noisy_directions(rng):
    wRi, wti = circle_poses(10)
    edges = all_pairs_edges(10, max_gap=4)
    _, i2Ui1 = relative_measurements(wRi, wti, edges, dir_noise_deg=2.0, rng=rng)
    res = ta.run_translation_averaging(10, edges, i2Ui1, wRi, num_projections=128)
    assert centers_match_up_to_sim3(res.wti, wti, res.valid, atol=0.3)


def test_outlier_edges_rejected(rng):
    """Corrupted directions must be flagged by MFAS and not poison recovery."""
    wRi, wti = circle_poses(10)
    edges = all_pairs_edges(10, max_gap=4)
    _, i2Ui1 = relative_measurements(wRi, wti, edges, dir_noise_deg=0.5, rng=rng)
    E = edges.shape[0]
    bad = rng.choice(E, size=E // 6, replace=False)
    for k in bad:
        v = rng.normal(size=3)
        i2Ui1[k] = (v / np.linalg.norm(v)).astype(np.float32)
    res = ta.run_translation_averaging(10, edges, i2Ui1, wRi, num_projections=256)
    # Most corrupted edges detected as outliers.
    assert (~res.inlier_edges[bad]).mean() > 0.5
    assert centers_match_up_to_sim3(res.wti, wti, res.valid, atol=0.4)


def test_mfas_weights_low_on_clean():
    wRi, wti = circle_poses(8)
    edges = all_pairs_edges(8)
    _, i2Ui1 = relative_measurements(wRi, wti, edges)
    w_dirs = np.einsum("eij,ej->ei", wRi[edges[:, 1]], i2Ui1)
    w = ta.mfas_outlier_weights(edges, w_dirs, 8, num_projections=128)
    assert w.max() < ta.OUTLIER_WEIGHT_THRESHOLD


def test_track_measurements_improve_chain_graph(rng):
    """A bare chain (spanning tree, no redundancy) is floppy; camera->landmark
    track measurements must stiffen it."""
    import jax.numpy as jnp

    wRi, wti = circle_poses(8)
    edges = all_pairs_edges(8, max_gap=1)  # chain only
    _, i2Ui1 = relative_measurements(wRi, wti, edges, dir_noise_deg=3.0, rng=rng)

    # Synthetic landmarks observed by several cameras -> rays in camera frame.
    X = np.stack([
        rng.uniform(-2, 2, 30), rng.uniform(-2, 2, 30), rng.uniform(-2, 2, 30)
    ], -1).astype(np.float32)
    T, L = 30, 8
    cam_idx = np.tile(np.arange(L, dtype=np.int64)[None], (T, 1))
    mask = np.ones((T, L), np.float32)
    rays = np.zeros((T, L, 3), np.float32)
    for t_i in range(T):
        for c in range(L):
            d_w = X[t_i] - wti[c]
            rays[t_i, c] = wRi[c].T @ (d_w / np.linalg.norm(d_w))

    res_plain = ta.run_translation_averaging(8, edges, i2Ui1, wRi, num_projections=64)
    res_tracks = ta.run_translation_averaging(
        8, edges, i2Ui1, wRi, num_projections=64,
        track_cam_idx=cam_idx, track_rays=rays, track_mask=mask,
    )

    def max_err(t_est):
        from gtsfm_tpu.geometry import alignment
        s, R, tr = alignment.umeyama_sim3(
            jnp.asarray(t_est, jnp.float32), jnp.asarray(wti, jnp.float32))
        aligned = float(s) * t_est @ np.asarray(R).T + np.asarray(tr)
        return np.abs(aligned - wti).max()

    e_plain, e_tracks = max_err(res_plain.wti), max_err(res_tracks.wti)
    assert e_tracks < e_plain * 0.8 or e_tracks < 0.15
    assert res_tracks.wti.shape == (8, 3)


def make_rig_scene(n_rigs=4, spacing=1.0):
    """n_rigs 5-camera rigs along a line (Hilti layout): body cam = 2."""
    R = 5
    offsets = np.asarray(
        [[0.12, 0, 0], [-0.12, 0, 0], [0, 0, 0], [0, 0.1, 0], [0, -0.1, 0]],
        np.float32,
    )
    wRi, wti = [], []
    for r in range(n_rigs):
        yaw = 0.15 * r
        c, s = np.cos(yaw), np.sin(yaw)
        Rb = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        tb = np.asarray([r * spacing, 0.05 * r, 0.0], np.float32)
        for k in range(R):
            wRi.append(Rb)
            wti.append(tb + Rb @ offsets[k])
    return np.stack(wRi), np.stack(wti)


def test_rig_translation_averaging():
    """Rig variant: metric rig/odometry priors fix structure AND scale
    (reference RigTranslationAveraging1DSFM, rig_1dsfm.py:25)."""
    from gtsfm_tpu.common.pose_prior import PosePrior, PosePriorType

    n_rigs, R = 4, 5
    wRi, wti = make_rig_scene(n_rigs)
    n = n_rigs * R

    # Direction edges: every camera pair across ADJACENT rigs (no intra-rig
    # direction edges — tiny baselines are exactly what the rig priors fix).
    edges = []
    for r in range(n_rigs - 1):
        for a in range(R):
            for b in range(R):
                edges.append((r * R + a, (r + 1) * R + b))
    edges = np.asarray(edges, np.int64)
    _, i2Ui1 = relative_measurements(wRi, wti, edges)

    priors = {}
    for r in range(n_rigs):
        for (c1, c2) in ta.VALID_HARD_CONSTRAINT_EDGES:
            i1, i2 = r * R + c1, r * R + c2
            priors[(i1, i2)] = PosePrior(
                wRi=wRi[i1].T @ wRi[i2],
                wti=wRi[i1].T @ (wti[i2] - wti[i1]),
                type=PosePriorType.HARD_CONSTRAINT,
            )
    for r in range(n_rigs - 1):
        i1, i2 = r * R + 2, (r + 1) * R + 2  # body cams
        priors[(i1, i2)] = PosePrior(
            wRi=wRi[i1].T @ wRi[i2],
            wti=wRi[i1].T @ (wti[i2] - wti[i1]),
            type=PosePriorType.SOFT_CONSTRAINT,
        )

    res = ta.run_rig_translation_averaging(
        n, edges, i2Ui1, wRi, priors, num_projections=128
    )
    assert res.valid.all()
    # Priors are metric -> recovered scale must be ~1 (not just up-to-Sim3).
    import jax.numpy as jnp
    from gtsfm_tpu.geometry import alignment

    s, Rm, tr = alignment.umeyama_sim3(
        jnp.asarray(res.wti, jnp.float32), jnp.asarray(wti, jnp.float32)
    )
    aligned = float(s) * res.wti @ np.asarray(Rm).T + np.asarray(tr)
    assert np.abs(aligned - wti).max() < 0.05
    assert abs(float(s) - 1.0) < 0.1, f"metric scale lost: s={float(s)}"


def test_projection_sampling_methods(rng):
    """All four sampling schemes (reference ProjectionSamplingMethod,
    averaging_1dsfm.py:105-130) return unit directions of the right count."""
    from gtsfm_tpu.multiview.translation_averaging import (
        sample_projection_directions,
    )

    m = rng.normal(size=(40, 3))
    m /= np.linalg.norm(m, axis=-1, keepdims=True)
    for method in ("uniform", "measurements", "kde", "mixed"):
        d = sample_projection_directions(m, 64, method=method, seed=1)
        assert d.shape == (64, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # measurements scheme actually draws from the inputs.
    d = sample_projection_directions(m, 16, method="measurements", seed=2)
    dots = np.abs(d @ m.T).max(axis=1)
    assert np.all(dots > 0.999)
    # empty measurement set degrades to uniform.
    d = sample_projection_directions(np.zeros((0, 3)), 8, method="kde")
    assert d.shape == (8, 3)
