"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference (arrufat/zignal) runs its pytest suite on CPU; we additionally
force 8 virtual XLA host devices so sharding/mesh tests exercise real
collectives without TPU hardware (SURVEY.md §4 implications).

This must run before `jax` is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
