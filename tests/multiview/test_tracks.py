"""DSF track formation (reference cpp_dsf_tracks_estimator.py via GTSAM DSF;
here gtsfm_tpu/native/dsf.cpp union-find)."""

import numpy as np

from gtsfm_tpu.multiview.tracks import tracks_from_matches, tracks_to_measurements


def test_transitive_merge():
    # (0,k0)-(1,k1) and (1,k1)-(2,k2) chain into one 3-view track.
    matches = {
        (0, 1): np.asarray([[3, 7]]),
        (1, 2): np.asarray([[7, 5]]),
    }
    tracks = tracks_from_matches(3, 16, matches, min_track_len=2)
    assert tracks == [[(0, 3), (1, 7), (2, 5)]]


def test_inconsistent_track_dropped():
    # Two different keypoints of image 2 union into the same component ->
    # the whole track is erroneous and dropped (reference policy).
    matches = {
        (0, 1): np.asarray([[0, 0]]),
        (1, 2): np.asarray([[0, 0]]),
        (0, 2): np.asarray([[0, 1]]),  # conflicts: image 2 kpt 1 vs kpt 0
    }
    tracks = tracks_from_matches(3, 8, matches, min_track_len=2)
    assert tracks == []


def test_min_track_len_filters():
    matches = {
        (0, 1): np.asarray([[0, 0], [1, 1]]),
        (1, 2): np.asarray([[0, 0]]),
    }
    t2 = tracks_from_matches(3, 8, matches, min_track_len=2)
    t3 = tracks_from_matches(3, 8, matches, min_track_len=3)
    assert len(t2) == 2
    assert len(t3) == 1 and len(t3[0]) == 3


def test_many_random_pairs_match_bruteforce():
    rng = np.random.default_rng(0)
    N, K = 6, 32
    matches = {}
    for i in range(N - 1):
        m = rng.choice(K, size=(8, 2), replace=False)
        matches[(i, i + 1)] = m
    tracks = tracks_from_matches(N, K, matches, min_track_len=2)
    # Brute-force union-find over the same edges.
    parent = list(range(N * K))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i1, i2), m in matches.items():
        for a, b in m:
            ra, rb = find(i1 * K + a), find(i2 * K + b)
            if ra != rb:
                parent[ra] = rb
    from collections import defaultdict

    comp = defaultdict(list)
    nodes = set()
    for (i1, i2), m in matches.items():
        for a, b in m:
            nodes.add(i1 * K + a)
            nodes.add(i2 * K + b)
    for n in nodes:
        comp[find(n)].append(n)
    expected = []
    for g in comp.values():
        if len(g) < 2:
            continue
        imgs = [n // K for n in g]
        if len(set(imgs)) != len(imgs):
            continue  # inconsistent
        expected.append(sorted((n // K, n % K) for n in g))
    got = sorted([sorted(t) for t in tracks])
    assert got == sorted(expected)


def test_tracks_to_measurements():
    kp = np.zeros((2, 4, 2), np.float32)
    kp[0, 1] = [5.0, 6.0]
    kp[1, 2] = [7.0, 8.0]
    out = tracks_to_measurements([[(0, 1), (1, 2)]], kp)
    assert out[0][0][0] == 0
    np.testing.assert_allclose(out[0][0][1], [5.0, 6.0])
    np.testing.assert_allclose(out[0][1][1], [7.0, 8.0])
