"""Common data model: fixed-shape pytree analogs of the reference's
GtsfmData / Keypoints / Image containers (reference gtsfm/common/)."""
