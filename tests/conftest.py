"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference (arrufat/zignal) runs its pytest suite on CPU; we additionally
force 8 virtual XLA host devices so sharding/mesh tests exercise real
collectives without TPU hardware (SURVEY.md §4 implications).

Note: this environment's sitecustomize imports jax at interpreter startup
and registers the 'axon' TPU backend, so setting JAX_PLATFORMS here is too
late — we override via jax.config instead (set ZT_TEST_PLATFORM to opt out).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("ZT_TEST_PLATFORM", "cpu"))


# Modules dominated by multi-second jit compiles / end-to-end demos
# (measured with --durations, r4). `pytest -m "not slow"` is the tight
# edit loop (~3 min); CI / pre-commit runs the full suite.
_SLOW_MODULES = {
    "test_examples_smoke", "test_features", "test_qrcode",
    "test_pallas_pipeline", "test_pallas_filter", "test_blurs_edges",
    "test_flood_fill", "test_spatial_sharding",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
