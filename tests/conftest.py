"""Test harness: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) — the TPU-native answer to
"test multi-device without a cluster".

The environment may pre-import jax with ``JAX_PLATFORMS`` pointing at real
TPU hardware (a sitecustomize hook), so setting the env var here is not
enough — the jax config must be updated directly before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
