"""Full sensor-width database lookup (VERDICT r3 item 8).

Reference parity: gtsfm/common/sensor_width_database.py over the ~3.6k-entry
assets/camera_details/sensor_database.csv — EXIF (Make, Model) -> sensor
width in mm with normalized substring matching, exact-model priority, and
failure on ambiguous or missing entries (here None -> FOV-prior fallback,
where the reference raises)."""

import numpy as np

from gtsfm_tpu.common import sensor_db
from gtsfm_tpu.common.image import Image


def test_known_models_resolve():
    # A handful of real cameras spanning makers, matched via the full DB.
    assert sensor_db.lookup("Canon", "Canon EOS 5D") == 35.8
    assert sensor_db.lookup("Canon", "Canon EOS 5D Mark II") == 36.0
    assert sensor_db.lookup("Apple", "iPhone 4S") == 4.54
    assert sensor_db.lookup("NIKON CORPORATION", "NIKON D70") == 23.7
    assert sensor_db.lookup("OLYMPUS IMAGING CORP.", "AZ-1") == 5.33


def test_maker_first_token_and_dash_normalization():
    # Maker matched on its first token; model spaces/dashes stripped.
    assert sensor_db.lookup("Canon Inc.", "EOS-5D") == 35.8


def test_unknown_and_ambiguous_return_none():
    assert sensor_db.lookup("NoSuchMaker", "XYZ-9000") is None
    # Bare "iPhone" prefixes many models -> ambiguous -> None.
    assert sensor_db.lookup("Apple", "iPhone") is None
    assert sensor_db.lookup("", "") is None


def test_exif_focal_via_full_db():
    """EXIF FocalLength + full-DB sensor width -> pixel focal."""
    img = Image(
        value_array=np.zeros((480, 640, 3), np.uint8),
        exif_data={
            "FocalLength": 24.0,
            "Make": "Canon",
            "Model": "Canon EOS 5D",
        },
    )
    f = img.focal_from_exif()
    assert f is not None
    np.testing.assert_allclose(f, 24.0 / 35.8 * 640, rtol=1e-6)

    img2 = Image(
        value_array=np.zeros((480, 640, 3), np.uint8),
        exif_data={
            "FocalLength": 4.3,
            "Make": "Apple",
            "Model": "iPhone 4S",  # only resolvable through the CSV DB
        },
    )
    f2 = img2.focal_from_exif()
    assert f2 is not None
    np.testing.assert_allclose(f2, 4.3 / 4.54 * 640, rtol=1e-6)


def test_fov_fallback_when_unresolvable():
    img = Image(
        value_array=np.zeros((480, 640, 3), np.uint8),
        exif_data={"FocalLength": 5.0, "Make": "Unknown", "Model": "Cam-X"},
    )
    assert img.focal_from_exif() is None
    cal = img.guess_intrinsics()
    assert cal[0] > 0  # FOV prior engaged
