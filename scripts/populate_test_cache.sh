#!/bin/sh
# Populate the persistent XLA compile cache for the test suite via SHORT
# per-directory pytest processes with cache writes enabled
# (GTSFM_TEST_CACHE_WRITE=1). The full one-process suite runs with writes
# DISABLED (tests/conftest.py): XLA:CPU executable serialization segfaults
# late in long processes in this environment (r4), while short processes
# serialize reliably. Run this once per machine-boot; subsequent full-suite
# runs then hit warm cache entries for every program.
set -x
for d in tests/geometry tests/common tests/ops tests/frontend tests/twoview \
         tests/multiview tests/bundle tests/io tests/loader tests/densify \
         tests/evaluation tests/retriever tests/pipeline tests/parallel \
         tests/repro tests/ui; do
  GTSFM_TEST_CACHE_WRITE=1 timeout 2400 python -m pytest "$d" -q || true
done
GTSFM_TEST_CACHE_WRITE=1 timeout 2400 python -m pytest tests/test_integration_door.py -q || true
