"""Test environment: CPU backend with 8 fake devices.

SURVEY.md section 4 ("distributed without a cluster"): the TPU analogue of a
fake communication backend is ``--xla_force_host_platform_device_count=8`` on
the CPU backend, so every shard_map / sharding-constraint code path runs as 8
devices in CI with no TPU attached. Must be set before jax initialises.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The environment may pin JAX_PLATFORMS to a TPU plugin via sitecustomize;
# jax.config wins over the env var, so force CPU here (before any jax use).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# SURVEY.md section 5.2: internal invariant checking in CI.
jax.config.update("jax_enable_checks", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collaborative_gan_sampling_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache,
)

enable_compile_cache()
