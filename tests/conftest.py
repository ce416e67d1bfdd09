"""Test env: force CPU backend with 8 fake devices (SURVEY.md §4.2).

Sharding/bank tests need a multi-device mesh without real TPU hardware;
`--xla_force_host_platform_device_count=8` is JAX's standard lever for that.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This JAX build's DEFAULT matmul precision is bf16-class even on CPU; tests
# compare f32 kernels against f32 references, so pin true-f32 matmuls.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")
