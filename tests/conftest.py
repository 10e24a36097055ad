"""Test configuration: force CPU (8 virtual devices for SPMD tests) + f64.

The reference test suite runs in f64 on CPU; parity tests here do the same
(f64 on TPU is emulated, see SURVEY.md §7 "Hard parts" #2). Sharding tests
use the standard JAX trick of N virtual CPU host devices.

Note: this environment force-registers the TPU plugin regardless of
JAX_PLATFORMS, so the platform must also be pinned via jax.config.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: do NOT enable jax_compilation_cache_dir here. The persistent
# compilation cache's read path (compilation_cache.get_executable_and_time,
# zstandard decompress) segfaults in this jaxlib build — reproduced twice,
# single-process, fresh cache. The suite pays full compile cost every run.
