"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding logic is testable without TPU hardware (SURVEY.md §4).

NOTE on this image: a sitecustomize hook registers the `axon` TPU-tunnel
backend in every interpreter and forces jax_platforms="axon,cpu", so env vars
alone don't select CPU — the config must be overridden after import (before
any backend use). XLA_FLAGS still works because the CPU client initializes
lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the env step program is large; caching makes
# repeated test runs fast. Host-fingerprinted dir — XLA:CPU AOT entries
# SIGSEGV when loaded on a different host (utils/jax_cache.py).
from deep_rl_grasping_tpu.utils import jax_cache  # noqa: E402

jax_cache.setup(cpu=True)

assert jax.default_backend() == "cpu", "tests must not run through the TPU tunnel"
