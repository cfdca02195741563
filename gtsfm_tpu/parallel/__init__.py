"""Multi-device SPMD execution: mesh construction, pair-sharded front-end,
distributed bundle adjustment (reference's Dask scatter/submit/gather
replaced by jax.sharding + collectives, SURVEY.md section 5)."""

from gtsfm_tpu.parallel.distributed import (  # noqa: F401
    make_mesh,
    distributed_ba_gn_step,
    pair_sharded_verify,
)
