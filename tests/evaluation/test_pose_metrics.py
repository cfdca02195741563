import numpy as np

from gtsfm_tpu.evaluation import pose_metrics


def test_pose_auc_perfect():
    auc = pose_metrics.pose_auc(np.zeros(10))
    assert auc["auc_1.0deg"] > 0.99


def test_pose_auc_monotone(rng):
    errs = rng.uniform(0, 8, 200)
    auc = pose_metrics.pose_auc(errs)
    assert auc["auc_1.0deg"] <= auc["auc_2.5deg"] <= auc["auc_5.0deg"] <= auc["auc_10.0deg"]
    assert 0 <= auc["auc_1.0deg"] <= 1


def test_compute_ba_pose_metrics(rng):
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import lie
    from tests.multiview.sample_poses import circle_poses

    wRi, wti = circle_poses(6)
    # gauge-transformed copy
    G = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, 0.3])))
    wRi2 = np.einsum("ij,njk->nik", G, wRi)
    wti2 = 2.0 * np.einsum("ij,nj->ni", G, wti) + np.asarray([1.0, 2, 3], np.float32)
    m = pose_metrics.compute_ba_pose_metrics(wRi2, wti2, wRi, wti)
    assert m["mean_rotation_error_deg"] < 0.1
    assert m["mean_translation_error"] < 0.01
    assert m["rotation_auc"]["auc_1.0deg"] > 0.9


def test_aggregators(rng):
    from gtsfm_tpu.frontend import aggregator

    k1 = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    k2 = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    # Pair (0,1) and (0,2) share the SAME detections in image 0.
    pairs = {(0, 1): (k1, k2), (0, 2): (k1 + 0.5, rng.uniform(0, 100, (10, 2)).astype(np.float32))}

    kpts_u, m_u = aggregator.aggregate_unique(pairs, 3)
    assert kpts_u[0].shape[0] == 20  # duplicated
    kpts_d, m_d = aggregator.aggregate_dedup(pairs, 3)
    assert kpts_d[0].shape[0] == 10  # merged within 3 px
    # match indices stay valid
    for (a, b), m in m_d.items():
        assert m[:, 0].max() < kpts_d[a].shape[0]
        assert m[:, 1].max() < kpts_d[b].shape[0]


def test_plots(tmp_path, rng):
    from gtsfm_tpu import visualization as viz

    img = (rng.random((50, 60, 3)) * 255).astype(np.uint8)
    uv = rng.uniform(0, 50, (20, 2))
    p1 = viz.plot_correspondences(img, img, uv, uv + 2, save_path=str(tmp_path / "c.png"))
    p2 = viz.plot_pose_graph(rng.normal(size=(5, 3)), save_path=str(tmp_path / "p.png"))
    p3 = viz.plot_scene_3d(rng.normal(size=(100, 3)), save_path=str(tmp_path / "s.png"))
    import os

    assert all(os.path.getsize(p) > 1000 for p in (p1, p2, p3))
