"""Generate the golden activation fixtures (tests/data/goldens/*.npz).

Run once (and after any INTENTIONAL numerics change):

    python scripts/gen_goldens.py

Each fixture is the output of the converted deep model on a deterministic
synthetic checkpoint + seeded input (tests/frontend/golden_utils.py).
tests/frontend/test_golden_activations.py compares fresh runs against these.
"""

import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", __import__("gtsfm_tpu.common.cache_dirs", fromlist=["compile_cache_dir"]).compile_cache_dir())

import numpy as np

from tests.frontend.golden_utils import MODELS

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "goldens",
)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, (build, run, fname) in MODELS.items():
            ckpt = os.path.join(td, fname)
            build(ckpt)
            out = run(ckpt)
            path = os.path.join(OUT_DIR, f"{name}.npz")
            np.savez(path, **out)
            sizes = {k: v.shape for k, v in out.items()}
            print(f"{name}: {sizes} -> {path}")


if __name__ == "__main__":
    main()
