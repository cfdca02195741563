"""Bundle adjustment: LM with Schur-complement camera reduction + PCG
(reference gtsfm/bundle/bundle_adjustment.py, GTSAM factor graph + LM)."""
