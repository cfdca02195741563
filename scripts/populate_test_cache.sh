#!/bin/sh
# Run the suite as SHORT per-directory pytest processes with the persistent
# compile cache enabled (GTSFM_TEST_CACHE_WRITE=1). The default one-process
# suite runs with NO persistent cache (tests/conftest.py): this
# environment's XLA:CPU AOT cache serialize/deserialize reproducibly
# segfaults (r4). Use this script for fast warm repeat runs when the
# environment's cache path is trusted; each directory is its own process,
# so a crash costs one module, not the suite.
set -x
for d in tests/geometry tests/common tests/ops tests/frontend tests/twoview \
         tests/multiview tests/bundle tests/io tests/loader tests/densify \
         tests/evaluation tests/retriever tests/pipeline tests/parallel \
         tests/repro tests/ui tests/differential; do
  GTSFM_TEST_CACHE_WRITE=1 timeout 2400 python -m pytest "$d" -q || true
done
GTSFM_TEST_CACHE_WRITE=1 timeout 2400 python -m pytest tests/test_integration_door.py -q || true
