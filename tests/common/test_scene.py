import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.geometry import cameras, lie


def build_test_scene(rng, n_cams=3, n_tracks=5):
    wRi = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=(n_cams, 3)) * 0.1, jnp.float32)))
    wti = np.asarray([[i * 1.0, 0.0, -10.0] for i in range(n_cams)], np.float32)
    cal = np.tile(np.asarray([300.0, 0, 0, 320, 240], np.float32), (n_cams, 1))
    X = rng.uniform(-2, 2, size=(n_tracks, 3)).astype(np.float32)
    tracks = []
    for j in range(n_tracks):
        tr = []
        for i in range(n_cams):
            uv, depth = cameras.project_bundler(
                jnp.asarray(wRi[i]), jnp.asarray(wti[i]), jnp.asarray(cal[i]), jnp.asarray(X[j])
            )
            assert float(depth) > 0
            tr.append((i, np.asarray(uv)))
        tracks.append(tr)
    sc = scene_mod.make_scene(wRi, wti, cal, tracks, pad_tracks_to=8, pad_meas_to=32)
    sc = sc.__class__(**{**sc.__dict__, "points": jnp.asarray(X if n_tracks == 8 else np.vstack([X, np.zeros((8 - n_tracks, 3), np.float32)]))})
    return sc, X


def test_reprojection_zero_at_gt(rng):
    sc, X = build_test_scene(rng)
    err, depth = sc.reprojection_errors()
    assert float(jnp.max(err)) < 1e-2
    assert sc.num_cameras() == 3
    assert sc.num_tracks() == 5
    assert sc.num_measurements() == 15


def test_track_lengths(rng):
    sc, _ = build_test_scene(rng)
    lens = np.asarray(sc.track_lengths())
    assert np.all(lens[:5] == 3)
    assert np.all(lens[5:] == 0)


def test_filter_landmarks(rng):
    sc, X = build_test_scene(rng)
    # Corrupt one measurement badly.
    uv = sc.meas_uv.at[0].add(jnp.asarray([500.0, 0.0]))
    sc2 = sc.__class__(**{**sc.__dict__, "meas_uv": uv})
    filtered = sc2.filter_landmarks(reproj_thresh_px=3.0)
    assert filtered.num_measurements() == 14
    # Track 0 keeps 2 measurements -> survives.
    assert filtered.num_tracks() == 5
    # Filtering at a level that kills 2 of 3 measurements removes the track:
    # corrupt two measurements of track 0.
    uv2 = uv.at[1].add(jnp.asarray([500.0, 0.0]))
    sc3 = sc.__class__(**{**sc.__dict__, "meas_uv": uv2})
    f3 = sc3.filter_landmarks(reproj_thresh_px=3.0)
    assert f3.num_tracks() == 4


def test_padding_is_inert(rng):
    """Masked (padded) measurements must not change metrics."""
    sc, _ = build_test_scene(rng)
    # Write garbage into padded region.
    uv = sc.meas_uv.at[20:].set(99999.0)
    sc2 = sc.__class__(**{**sc.__dict__, "meas_uv": uv})
    np.testing.assert_allclose(
        float(sc.mean_reprojection_error()), float(sc2.mean_reprojection_error()), atol=1e-6
    )


def test_tracks_to_padded(rng):
    sc, _ = build_test_scene(rng)
    cam_idx, uv, mask = scene_mod.tracks_to_padded(sc, max_track_len=4)
    assert cam_idx.shape == (8, 4)
    assert np.sum(mask) == 15
    assert np.all(mask[:5, :3] == 1)
