"""Evaluation: metrics containers, reports (reference gtsfm/evaluation/)."""
