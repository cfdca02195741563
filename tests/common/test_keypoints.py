"""Keypoints container invariants (reference tests mirror:
tests/common/test_keypoints.py over gtsfm/common/keypoints.py:15)."""

import numpy as np

from gtsfm_tpu.common.keypoints import Keypoints, pad_keypoints_batch


def _kps(n=10, seed=0):
    rng = np.random.default_rng(seed)
    return Keypoints(
        coordinates=rng.uniform(0, 100, (n, 2)),
        scales=rng.uniform(1, 4, n),
        responses=rng.uniform(0, 1, n),
    )


def test_len_and_eq():
    k = _kps(7)
    assert len(k) == 7
    assert k == _kps(7)
    assert not (k == _kps(7, seed=1))
    # Missing optional fields must not compare equal to present ones.
    assert not (k == Keypoints(k.coordinates))


def test_select_preserves_fields():
    k = _kps(10)
    s = k.select(np.asarray([3, 1, 4]))
    assert len(s) == 3
    np.testing.assert_allclose(s.coordinates, k.coordinates[[3, 1, 4]])
    np.testing.assert_allclose(s.responses, k.responses[[3, 1, 4]])
    np.testing.assert_allclose(s.scales, k.scales[[3, 1, 4]])


def test_top_k_by_response():
    k = _kps(20)
    top, idxs = k.top_k(5)
    assert len(top) == 5
    # top-5 responses are the 5 largest overall
    thresh = np.sort(k.responses)[-5]
    assert np.all(top.responses >= thresh)
    np.testing.assert_allclose(top.coordinates, k.coordinates[idxs])
    # k >= N is identity
    same, idxs2 = k.top_k(50)
    assert len(same) == 20 and np.array_equal(idxs2, np.arange(20))


def test_top_k_without_responses_keeps_first():
    k = Keypoints(np.arange(20).reshape(10, 2))
    top, idxs = k.top_k(4)
    assert np.array_equal(idxs, np.arange(4))


def test_filter_by_mask():
    coords = np.asarray([[2.0, 3.0], [50.0, 3.0], [-1.0, 0.0], [7.0, 9.4]])
    k = Keypoints(coords)
    mask = np.zeros((20, 60))  # (H=20, W=60): u=col in [0,60), v=row in [0,20)
    mask[3, 2] = 1  # keeps (2, 3)
    mask[9, 7] = 1  # keeps (7, 9.4) via rounding
    kept, idxs = k.filter_by_mask(mask)
    assert np.array_equal(idxs, [0, 3])
    assert len(kept) == 2


def test_pad_keypoints_batch_shapes_and_mask():
    lst = [_kps(3), _kps(5), Keypoints(np.zeros((0, 2)))]
    out = pad_keypoints_batch(lst, max_kpts=6)
    coords, mask = out[0], out[1]
    assert coords.shape == (3, 6, 2)
    assert mask.shape == (3, 6)
    np.testing.assert_array_equal(mask.sum(-1), [3, 5, 0])
    np.testing.assert_allclose(np.asarray(coords)[1, :5], lst[1].coordinates)
    # Padding slots are zeroed.
    assert float(np.abs(np.asarray(coords)[0, 3:]).max()) == 0.0
