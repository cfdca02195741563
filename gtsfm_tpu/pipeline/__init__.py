"""Pipeline orchestration (reference gtsfm/scene_optimizer.py +
multi_view_optimizer.py): one SPMD program per stage instead of a Dask graph."""
