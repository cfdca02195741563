"""Batched device ops: RANSAC engine, descriptor matching, union-find, etc."""
