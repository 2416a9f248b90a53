"""Test env: run JAX on CPU with 8 virtual devices so sharding tests work
without real multi-chip hardware.

Note: the environment's sitecustomize imports jax and registers the TPU
plugin at interpreter start, so JAX_PLATFORMS env vars are too late here;
we must go through jax.config. XLA_FLAGS still works because backends are
initialized lazily at first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA-CPU compiles of our integer-heavy graphs are minutes-slow on this
# 2-core box; cache them persistently so each graph compiles once ever.
from olavm_tpu.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()
