"""Persistent-compilation-cache setup that survives VM host migration.

One shared cache dir is NOT safe across backends here: TPU executables are
device code and deserialize on any host, but XLA:CPU entries are
AOT-compiled for the exact host CPU feature set, and this VM migrates
between physical hosts (observed 2026-08-18: SIGSEGV inside
`compilation_cache.get_executable_and_time` deserializing an entry written
on the previous host; `cpu_aot_loader.cc` logs the machine-feature
mismatch and usually falls back, but not always). CPU runs therefore get a
cache dir keyed by a fingerprint of the host's CPU flags; a migration
costs one cold compile instead of a crash.
"""

from __future__ import annotations

import hashlib
import os

# TPU executables are host-portable, so the TPU cache lives in the repo —
# /tmp is wiped when the VM migrates hosts, and a cold compile of the full
# fused train step costs tens of minutes on this 1-core host.
TPU_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache_tpu",
)


def host_fingerprint() -> str:
    """Stable id for this host's CPU feature set (what XLA:CPU AOT keys on)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def cache_dir(cpu: bool) -> str:
    return f"/tmp/jax_cache_grasp_cpu_{host_fingerprint()}" if cpu else TPU_DIR


def setup(cpu: bool | None = None) -> str:
    """Point jax's persistent compilation cache at the right dir.

    cpu=None infers from JAX_PLATFORMS (the CLIs honor it for tunnel-down
    CPU runs); pass cpu=True/False explicitly where the platform is pinned
    in code (tests/conftest.py, the dryrun subprocess).
    """
    if cpu is None:
        cpu = os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu"
    import jax

    d = cache_dir(cpu)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
