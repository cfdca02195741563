"""View-graph estimation: rotation cycle-consistency edge filtering.

TPU-native equivalent of the reference's
CycleConsistentRotationViewGraphEstimator
(gtsfm/view_graph_estimator/cycle_consistent_rotation_estimator.py:49):
enumerate all triplets in the pair graph, compute the cyclic rotation error
|| Log(inv(i2Ri0) @ i2Ri1 @ i1Ri0) || per triplet (batched on device), then
aggregate per edge with MIN or MEDIAN and keep edges below 7 degrees
(ERROR_THRESHOLD, :26). Edges in no triplet are discarded, exactly like the
reference.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gtsfm_tpu.geometry import lie

ERROR_THRESHOLD_DEG = 7.0  # reference cycle_consistent_rotation_estimator.py:26


def enumerate_triplets(edges: np.ndarray) -> np.ndarray:
    """All (i0 < i1 < i2) with all three edges present. Returns (T, 3) node ids."""
    edge_set = {tuple(e) for e in edges.tolist()}
    adj: dict[int, set[int]] = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    triplets = []
    for a, b in sorted(edge_set):
        common = adj.get(a, set()) & adj.get(b, set())
        for c in common:
            if c > b:
                triplets.append((a, b, c))
    return np.asarray(sorted(set(triplets)), np.int64).reshape(-1, 3)


def filter_cycle_consistent_edges(
    edges: np.ndarray,  # (E, 2) with i1 < i2
    i2Ri1: np.ndarray,  # (E, 3, 3)
    threshold_deg: float = ERROR_THRESHOLD_DEG,
    aggregation: str = "min",  # reference EdgeErrorAggregationCriterion
) -> tuple[np.ndarray, dict]:
    """Returns (keep_mask (E,) bool, info with per-edge aggregated errors)."""
    E = edges.shape[0]
    if E == 0:
        return np.zeros(0, bool), {"num_triplets": 0}
    edge_index = {tuple(e): k for k, e in enumerate(edges.tolist())}
    triplets = enumerate_triplets(edges)
    if triplets.shape[0] == 0:
        return np.zeros(E, bool), {"num_triplets": 0}

    e01 = np.asarray([edge_index[(a, b)] for a, b, _ in triplets])
    e12 = np.asarray([edge_index[(b, c)] for _, b, c in triplets])
    e02 = np.asarray([edge_index[(a, c)] for a, _, c in triplets])

    R = jnp.asarray(i2Ri1)
    # Edge (a,b) stores bRa. Cycle: cRa_pred = cRb @ bRa; error vs stored cRa.
    cRa_pred = R[e12] @ R[e01]
    err = np.asarray(jnp.degrees(lie.rotation_angular_distance(cRa_pred, R[e02])))

    agg = np.full(E, np.inf)
    if aggregation == "min":
        for ek in (e01, e12, e02):
            np.minimum.at(agg, ek, err)
    else:  # median
        per_edge: dict[int, list[float]] = {}
        for t in range(triplets.shape[0]):
            for k in (e01[t], e12[t], e02[t]):
                per_edge.setdefault(k, []).append(err[t])
        for k, v in per_edge.items():
            agg[k] = float(np.median(v))

    keep = agg < threshold_deg
    return keep, {
        "num_triplets": int(triplets.shape[0]),
        "edge_errors_deg": agg,
        "num_kept": int(keep.sum()),
    }


def prune_to_largest_connected_component(
    num_images: int,
    edges: np.ndarray,  # (E, 2)
    *edge_attrs: np.ndarray,  # per-edge arrays to filter alongside
) -> tuple[np.ndarray, tuple, np.ndarray]:
    """Keep only edges inside the largest connected component of the pair
    graph (reference multi_view_optimizer.py:123 -> utils/graph.py:42).

    A disconnected graph would give every component an arbitrary relative
    gauge through the dense connection-Laplacian rotation averaging; the
    reference prunes, so do we. Returns (edges, tuple(filtered attrs),
    cc_node_mask (num_images,) bool).
    """
    from gtsfm_tpu import native

    if edges.shape[0] == 0:
        return edges, tuple(a[:0] for a in edge_attrs), np.zeros(num_images, bool)
    cc_mask = native.largest_connected_component(
        num_images, edges[:, 0], edges[:, 1]
    )
    in_cc = cc_mask[edges[:, 0]] & cc_mask[edges[:, 1]]
    return edges[in_cc], tuple(a[in_cc] for a in edge_attrs), cc_mask
