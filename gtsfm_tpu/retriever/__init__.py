"""Image-pair retrieval (reference gtsfm/retriever/): sequential window,
exhaustive, and similarity-based (NetVLAD) regimes."""

from gtsfm_tpu.retriever.basic import (  # noqa: F401
    ImageMatchingRegime,
    exhaustive_pairs,
    sequential_hilti_pairs,
    sequential_pairs,
)
