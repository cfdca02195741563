"""Olsson loader tests against the real Lund door dataset shipped with the
reference (data only, no code). Skipped when unavailable."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DATA, reference_data_available

DOOR = os.path.join(REFERENCE_DATA, "set1_lund_door")

pytestmark = pytest.mark.skipif(
    not reference_data_available(), reason="reference test data not mounted"
)


@pytest.fixture(scope="module")
def loader():
    from gtsfm_tpu.loader.olsson import OlssonLoader

    return OlssonLoader(DOOR, max_frame_lookahead=12, max_resolution=760)


def test_len_and_filenames(loader):
    assert len(loader) == 12
    assert loader.image_filenames()[0] == "DSC_0001.JPG"


def test_intrinsics(loader):
    cal = loader.get_camera_intrinsics_full_res(0)
    # Known door calibration: f ~ 2398, pp ~ (628, 932)
    assert 2300 < cal[0] < 2500
    assert 600 < cal[3] < 660
    assert 900 < cal[4] < 960


def test_poses_reproject(loader):
    """Decomposed K, R, t must reproduce the original P matrices."""
    import scipy.io

    data = scipy.io.loadmat(os.path.join(DOOR, "data.mat"))
    P0 = np.asarray(data["P"][0, 0])
    U = np.asarray(data["U"])[:, :100]  # homogeneous 3D points
    wRi, wti = loader.get_camera_pose(0)
    cal = loader.get_camera_intrinsics_full_res(0)
    X = (U[:3] / U[3]).T
    # project with decomposed pose
    R = wRi.T
    t = -R @ wti
    Xc = X @ R.T + t
    uv_dec = Xc[:, :2] / Xc[:, 2:3] * cal[0] + cal[3:5]
    # project with original P
    uvh = (np.concatenate([X, np.ones((100, 1))], axis=1) @ P0.T)
    uv_gt = uvh[:, :2] / uvh[:, 2:3]
    # f_x != f_y slightly, so tolerance is a few px
    assert np.median(np.linalg.norm(uv_dec - uv_gt, axis=1)) < 3.0


def test_get_image_rescales(loader):
    img, cal = loader.get_image(0)
    assert min(img.height, img.width) <= 760
    full_cal = loader.get_camera_intrinsics_full_res(0)
    scale = min(img.height, img.width) / 1296
    assert abs(cal[0] - full_cal[0] * scale) / full_cal[0] < 0.01


def test_valid_pairs(loader):
    assert loader.is_valid_pair(0, 1)
    assert not loader.is_valid_pair(1, 0)
    assert not loader.is_valid_pair(0, 0)
