"""Feature front-end: detectors/descriptors, matchers, retrieval
(reference gtsfm/frontend/). Classical ops are jitted JAX programs; deep
models are Flax modules with torch-checkpoint weight converters."""
