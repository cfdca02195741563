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
