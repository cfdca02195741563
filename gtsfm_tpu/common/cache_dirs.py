"""Compile-cache location helpers.

XLA:CPU's persistent cache stores AOT machine code; loading an entry
produced on a different CPU microarchitecture (VM migration between runs,
or a cache directory copied between hosts) can execute unsupported
instructions and abort the process mid-run (SIGILL). Keying the directory
by a machine identity tag makes the cache self-invalidating across machine
and toolchain changes.

The tag folds in:
  * jax + jaxlib versions — XLA's serialized-executable format and its
    target-feature tuning (e.g. the prefer-no-scatter/prefer-no-gather
    pseudo-features) change across releases independently of the CPU;
  * the /proc/cpuinfo feature-flag line — catches microarchitecture
    changes on Linux;
  * a per-machine fallback (hostname + arch + processor) where
    /proc/cpuinfo is absent, so two different non-Linux machines never
    collapse to one shared "generic" cache.
"""

from __future__ import annotations

import hashlib
import platform


def _machine_identity() -> str:
    import jax

    try:
        import jaxlib

        jaxlib_ver = getattr(jaxlib, "version", None)
        jaxlib_ver = getattr(jaxlib_ver, "__version__", "unknown")
    except Exception:  # pragma: no cover
        jaxlib_ver = "unknown"
    parts = [f"jax={jax.__version__}", f"jaxlib={jaxlib_ver}"]
    cpu_flags = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    cpu_flags = line.strip()
                    break
    except OSError:
        pass
    # Boot identity: this environment's VM migrates between physical hosts
    # MID-SESSION with an unchanged /proc/cpuinfo flags line, and loading a
    # same-dir AOT entry compiled pre-migration segfaulted the test suite
    # (r4, jax compilation_cache.get_executable_and_time). A migration is
    # always a new boot, so folding boot_id in self-invalidates the cache
    # at exactly the right granularity (reboots pay one cold compile).
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f"boot={f.read().strip()}")
    except OSError:
        pass
    if cpu_flags is not None:
        parts.append(cpu_flags)
    else:  # non-Linux: per-machine, NOT a shared generic bucket
        parts.append(
            f"{platform.node()}|{platform.machine()}|{platform.processor()}"
        )
    return "\n".join(parts)


def compile_cache_dir(prefix: str = "/tmp/jax_test_cache") -> str:
    tag = hashlib.sha1(_machine_identity().encode()).hexdigest()[:12]
    return f"{prefix}_{tag}"
