"""Test configuration: run on CPU with 8 virtual devices so sharding tests
work without a pod, and TPU (axon tunnel) compile latency stays out of the
dev loop.

Note: the axon PJRT plugin ignores the JAX_PLATFORMS environment variable,
so the platform must be forced through jax.config before any computation.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
