"""Test configuration: force an 8-device CPU JAX platform.

The axon TPU plugin registers itself in sitecustomize before pytest starts,
so we steer JAX back to CPU here (config update happens before any backend is
initialized because no test module creates arrays at import time). Multi-chip
sharding tests then run on a virtual 8-device CPU mesh, per SURVEY.md §4.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
