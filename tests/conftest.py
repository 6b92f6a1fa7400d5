"""Test harness: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) — the TPU-native answer to
"test multi-device without a cluster".  This must happen before jax is
imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
