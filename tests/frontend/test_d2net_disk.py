"""D2-Net and DISK architecture tests (random init; converters exercised in
test_weight_converters when checkpoints exist)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend.deep import d2net, disk


@pytest.fixture(scope="module")
def d2():
    return d2net.D2Net(max_keypoints=128).init_random()


@pytest.fixture(scope="module")
def dk():
    return disk.Disk(max_keypoints=128).init_random()


def _rgb(rng, h=64, w=64):
    return jnp.asarray(rng.random((h, w, 3)), jnp.float32)


def test_d2net_shapes_and_masks(d2, rng):
    f = d2(_rgb(rng, 64, 96))
    assert f.uv.shape == (128, 2)
    assert f.descriptor.shape == (128, 512)
    live = np.asarray(f.mask) > 0
    if live.any():
        uv = np.asarray(f.uv)[live]
        assert uv[:, 0].max() < 96 and uv[:, 1].max() < 64
        d = np.asarray(f.descriptor)[live]
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_d2net_detection_scores():
    """A strong isolated bump on one channel must be detected; edges must not."""
    f = np.zeros((16, 16, 4), np.float32)
    f[8, 8, 1] = 5.0  # isolated peak
    f[:, 3, 2] = 3.0  # a ridge (edge-like) -> rejected by Hessian ratio test
    s = np.asarray(d2net.detection_scores(jnp.asarray(f)))
    assert s[8, 8] == 5.0
    assert (s[:, 3] == 0).all()


def test_d2net_localization():
    """Subpixel offset of a quadratic bump is recovered."""
    yy, xx = np.mgrid[0:17, 0:17].astype(np.float32)
    bump = np.exp(-0.5 * ((yy - 8.3) ** 2 + (xx - 7.6) ** 2))
    f = bump[..., None]
    d = np.asarray(d2net.localize(jnp.asarray(f), jnp.asarray([[8.0, 8.0]])))
    assert abs(d[0, 0] - 0.3) < 0.1
    assert abs(d[0, 1] + 0.4) < 0.1


def test_d2net_deterministic(d2, rng):
    img = _rgb(rng)
    f1, f2 = d2(img), d2(img)
    np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))


def test_disk_shapes_and_masks(dk, rng):
    f = dk(_rgb(rng, 64, 96))
    assert f.uv.shape == (128, 2)
    assert f.descriptor.shape == (128, 128)
    live = np.asarray(f.mask) > 0
    if live.any():
        uv = np.asarray(f.uv)[live]
        assert uv[:, 0].max() < 96 and uv[:, 1].max() < 64
        d = np.asarray(f.descriptor)[live]
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_disk_unet_output_shape(dk, rng):
    out = dk.net.apply({"params": dk.params}, jnp.zeros((1, 32, 48, 3)))
    assert out.shape == (1, 32, 48, 129)


def test_disk_nms_keeps_peak():
    h = jnp.zeros((32, 32)).at[5, 5].set(2.0).at[5, 6].set(1.0)
    out = disk.nms_window(h, 5)
    assert float(out[5, 5]) == 2.0
    assert not bool(jnp.isfinite(out[5, 6]))
