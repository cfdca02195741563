"""Two-view estimation: RANSAC verification + batched 2-view bundle
adjustment + inlier support processing (reference gtsfm/two_view_estimator.py)."""
