"""Test configuration: CPU backend, float64, 8 virtual devices for mesh tests.

The reference runs everything in Float64 on CPU; correctness oracles here do
the same (the axon TPU plugin has no f64 LU).  Multi-chip sharding tests use
an 8-device virtual CPU mesh via ``xla_force_host_platform_device_count``.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
