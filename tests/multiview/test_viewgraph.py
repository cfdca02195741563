import numpy as np

from gtsfm_tpu.multiview import viewgraph
from tests.multiview.sample_poses import all_pairs_edges, circle_poses, relative_measurements
from gtsfm_tpu.geometry import lie
import jax.numpy as jnp


def test_triplet_enumeration():
    edges = np.asarray([(0, 1), (1, 2), (0, 2), (2, 3)], np.int64)
    t = viewgraph.enumerate_triplets(edges)
    assert t.shape == (1, 3)
    np.testing.assert_array_equal(t[0], [0, 1, 2])


def test_clean_graph_keeps_all():
    wRi, wti = circle_poses(6)
    edges = all_pairs_edges(6, max_gap=3)
    i2Ri1, _ = relative_measurements(wRi, wti, edges)
    keep, info = viewgraph.filter_cycle_consistent_edges(edges, i2Ri1)
    assert keep.all()
    assert info["num_triplets"] > 0


def test_corrupt_edge_removed(rng):
    wRi, wti = circle_poses(6)
    edges = all_pairs_edges(6, max_gap=3)
    i2Ri1, _ = relative_measurements(wRi, wti, edges)
    # Corrupt one edge by 30 degrees.
    bad = 3
    pert = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, np.deg2rad(30)])))
    i2Ri1[bad] = pert @ i2Ri1[bad]
    keep, info = viewgraph.filter_cycle_consistent_edges(edges, i2Ri1, aggregation="min")
    assert not keep[bad]
    # Clean edges survive (min aggregation is forgiving for them).
    assert keep.sum() >= edges.shape[0] - 2


def test_no_triplets_drops_everything():
    edges = np.asarray([(0, 1), (2, 3)], np.int64)
    i2Ri1 = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    keep, info = viewgraph.filter_cycle_consistent_edges(edges, i2Ri1)
    assert not keep.any()
