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
