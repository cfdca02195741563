"""Compile-cache location helpers.

XLA:CPU's persistent cache stores AOT machine code; loading an entry
produced on a different CPU microarchitecture (VM migration between runs)
can execute unsupported instructions and abort the process mid-run. Keying
the directory by the host's CPU feature flags makes the cache
self-invalidating across machine changes.
"""

from __future__ import annotations

import hashlib


def compile_cache_dir(prefix: str = "/tmp/jax_test_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
            else:
                tag = "generic"
    except OSError:
        tag = "generic"
    return f"{prefix}_{tag}"
