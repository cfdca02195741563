"""Dataset loaders (reference gtsfm/loader/): Olsson, COLMAP, and the common
LoaderBase contract (image access, GT poses/intrinsics, pair validity)."""
