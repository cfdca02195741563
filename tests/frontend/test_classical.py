"""Classical detector zoo tests (FAST / Harris / DoG / ORB / BRISK)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend import classical
from gtsfm_tpu.ops import matching
from tests.frontend.test_sift import make_texture


@pytest.fixture(scope="module")
def texture():
    return make_texture(np.random.default_rng(42), n=192)


def make_square_image(n=128, lo=24, hi=104):
    img = np.zeros((n, n), np.float32)
    img[lo:hi, lo:hi] = 1.0
    return img


def test_fast_detects_square_corners():
    img = make_square_image()
    f = classical.detect_fast(jnp.asarray(img), max_keypoints=64)
    uv = np.asarray(f.uv)[np.asarray(f.mask) > 0]
    assert len(uv) >= 4
    corners = np.asarray(
        [[24, 24], [24, 103], [103, 24], [103, 103]], np.float32
    )
    for c in corners:
        d = np.linalg.norm(uv - c, axis=-1).min()
        assert d < 4.0, f"corner {c} missed by {d}px"


def test_harris_detects_square_corners():
    img = make_square_image()
    f = classical.detect_harris(jnp.asarray(img), max_keypoints=64)
    uv = np.asarray(f.uv)[np.asarray(f.mask) > 0]
    corners = np.asarray(
        [[24, 24], [24, 103], [103, 24], [103, 103]], np.float32
    )
    for c in corners:
        assert np.linalg.norm(uv - c, axis=-1).min() < 4.0


def test_dog_detector(texture):
    f = classical.detect_dog(jnp.asarray(texture), max_keypoints=256)
    assert float(f.mask.sum()) > 50
    assert f.descriptor.shape[-1] == 0  # detector-only


def test_orb_translation_matching(texture):
    shift = 10
    img2 = np.roll(texture, (shift, 0), axis=(0, 1))
    kw = dict(max_keypoints=512, num_levels=3, k_per_level=256)
    f1 = classical.orb_detect_and_describe(jnp.asarray(texture), **kw)
    f2 = classical.orb_detect_and_describe(jnp.asarray(img2), **kw)
    assert f1.descriptor.shape == (512, 256)
    idx, mm = matching.match_hamming(
        f1.descriptor[None], f2.descriptor[None], f1.mask[None], f2.mask[None],
        ratio_test=0.9,
    )
    x1, x2, cm = matching.matches_to_correspondences(idx, mm, f1.uv[None], f2.uv[None])
    assert float(cm.sum()) > 20
    dv = np.asarray(x2 - x1)[0][np.asarray(cm[0]) > 0]
    med = np.median(dv, axis=0)
    np.testing.assert_allclose(med, [0.0, shift], atol=1.5)


def test_orb_rotation_matching(texture):
    """90-degree rotation: steered BRIEF must stay matchable."""
    img2 = np.rot90(texture).copy()
    kw = dict(max_keypoints=512, num_levels=3, k_per_level=256)
    f1 = classical.orb_detect_and_describe(jnp.asarray(texture), **kw)
    f2 = classical.orb_detect_and_describe(jnp.asarray(img2), **kw)
    idx, mm = matching.match_hamming(
        f1.descriptor[None], f2.descriptor[None], f1.mask[None], f2.mask[None],
        ratio_test=0.9,
    )
    x1, x2, cm = matching.matches_to_correspondences(idx, mm, f1.uv[None], f2.uv[None])
    assert float(cm.sum()) > 15
    x1m = np.asarray(x1[0])[np.asarray(cm[0]) > 0]
    x2m = np.asarray(x2[0])[np.asarray(cm[0]) > 0]
    n = texture.shape[0]
    pred = np.stack([x1m[:, 1], n - 1 - x1m[:, 0]], axis=-1)
    err = np.linalg.norm(pred - x2m, axis=-1)
    assert np.median(err) < 3.0


def test_brisk_translation_matching(texture):
    shift = 8
    img2 = np.roll(texture, (0, shift), axis=(0, 1))
    kw = dict(max_keypoints=512, num_levels=2, k_per_level=256)
    f1 = classical.brisk_detect_and_describe(jnp.asarray(texture), **kw)
    f2 = classical.brisk_detect_and_describe(jnp.asarray(img2), **kw)
    assert f1.descriptor.shape == (512, 512)
    idx, mm = matching.match_hamming(
        f1.descriptor[None], f2.descriptor[None], f1.mask[None], f2.mask[None],
        ratio_test=0.9,
    )
    x1, x2, cm = matching.matches_to_correspondences(idx, mm, f1.uv[None], f2.uv[None])
    assert float(cm.sum()) > 20
    dv = np.asarray(x2 - x1)[0][np.asarray(cm[0]) > 0]
    med = np.median(dv, axis=0)
    np.testing.assert_allclose(med, [shift, 0.0], atol=1.5)


def test_determinism(texture):
    f1 = classical.orb_detect_and_describe(jnp.asarray(texture), max_keypoints=256, num_levels=2, k_per_level=128)
    f2 = classical.orb_detect_and_describe(jnp.asarray(texture), max_keypoints=256, num_levels=2, k_per_level=128)
    np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))
    np.testing.assert_array_equal(np.asarray(f1.descriptor), np.asarray(f2.descriptor))
