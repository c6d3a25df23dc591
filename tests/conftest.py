"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(shard_map/pjit collectives) are exercised without TPU hardware — the
strategy prescribed in SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var on this image;
# force the CPU backend explicitly so tests get the 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()

# persistent compile cache: repeat test runs skip recompilation
from texturefusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/tf_tpu_test_jax_cache")

import pytest  # noqa: E402

# Heavy integration modules (full-pipeline / shard_map compile loads):
# auto-marked `slow` so `pytest -m "not slow"` is the sub-2-minute
# quick-smoke signal for the build loop (VERDICT r4 next-round #8).
_SLOW_MODULES = {
    "test_pipeline", "test_streaming_pipeline", "test_origins",
    "test_checkpoint_cli", "test_gcslam", "test_parallel",
    "test_bench_regression", "test_ate_proxy_cli", "test_icp",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
