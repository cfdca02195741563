"""Front-end cache (checkpoint/resume layer) + keypoint aggregators
(reference gtsfm/frontend/cacher/*, keypoint_aggregator_{unique,dedup}.py)."""

import numpy as np

from gtsfm_tpu.frontend.aggregator import aggregate_dedup, aggregate_unique
from gtsfm_tpu.frontend.cacher import FeatureCache


def test_cache_key_sensitivity():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    k1 = FeatureCache.key(img, "sift:4096")
    assert k1 == FeatureCache.key(img.copy(), "sift:4096")  # content-addressed
    assert k1 != FeatureCache.key(img, "sift:2048")  # config in the key
    img2 = img.copy()
    img2[0, 0, 0] += 1
    assert k1 != FeatureCache.key(img2, "sift:4096")  # pixels in the key


def test_cache_roundtrip(tmp_path):
    c = FeatureCache(str(tmp_path / "feat"), enabled=True)
    arrays = {"kpts": np.random.rand(5, 2).astype(np.float32),
              "desc": np.random.rand(5, 128).astype(np.float32)}
    assert c.load("deadbeef") is None
    c.save("deadbeef", arrays)
    back = c.load("deadbeef")
    assert set(back) == {"kpts", "desc"}
    np.testing.assert_allclose(back["desc"], arrays["desc"])


def test_cache_disabled(tmp_path):
    c = FeatureCache(str(tmp_path / "feat"), enabled=False)
    c.save("k", {"a": np.zeros(3)})
    assert c.load("k") is None


def _pairs():
    # pair (0,1): 2 matches; pair (1,2): 2 matches, one of image 1's
    # keypoints within 2 px of one already seen in pair (0,1).
    return {
        (0, 1): (
            np.asarray([[10.0, 10.0], [20.0, 20.0]]),
            np.asarray([[30.0, 30.0], [40.0, 40.0]]),
        ),
        (1, 2): (
            np.asarray([[31.0, 31.0], [90.0, 90.0]]),
            np.asarray([[50.0, 50.0], [60.0, 60.0]]),
        ),
    }


def test_aggregate_unique():
    kpts, matches = aggregate_unique(_pairs(), num_images=3)
    assert [len(k) for k in kpts] == [2, 4, 2]  # no dedup: image 1 holds 4
    m01 = matches[(0, 1)]
    np.testing.assert_array_equal(m01, [[0, 0], [1, 1]])
    # indices point at the right coordinates
    np.testing.assert_allclose(kpts[1][matches[(1, 2)][0, 0]], [31.0, 31.0])


def test_aggregate_dedup_merges_within_radius():
    kpts, matches = aggregate_dedup(_pairs(), num_images=3, merge_radius=3.0)
    # (31,31) merged into (30,30): image 1 has 3 unique keypoints.
    assert len(kpts[1]) == 3
    # The merged keypoint keeps the FIRST observation's index.
    i_merged = matches[(1, 2)][0, 0]
    assert i_merged == matches[(0, 1)][0, 1]
    # Track chaining across the merge: (0,1) match 0 and (1,2) match 0 now
    # share image-1 keypoint -> a 3-view track exists.
    from gtsfm_tpu.multiview.tracks import tracks_from_matches

    tr = tracks_from_matches(
        3, max(len(k) for k in kpts),
        {k: v for k, v in matches.items()}, min_track_len=3,
    )
    assert len(tr) == 1 and len(tr[0]) == 3


def test_aggregate_dedup_respects_radius():
    kpts, _ = aggregate_dedup(_pairs(), num_images=3, merge_radius=0.5)
    assert len(kpts[1]) == 4  # nothing merged at 0.5 px
