"""Pallas TPU kernels for hot ops (flash attention for matchers, etc.)."""
