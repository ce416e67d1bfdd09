"""Test env: force CPU backend with 8 fake devices (SURVEY.md §4.2).

Sharding/bank tests need a multi-device mesh without real TPU hardware;
`--xla_force_host_platform_device_count=8` is JAX's standard lever for that.

Gotcha (this image): the axon TPU plugin prepends itself to jax_platforms at
import time, so the JAX_PLATFORMS env var alone does NOT select cpu — the
config must be updated after importing jax, before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Opt-in real-hardware runs (VPT_TEST_BACKEND=tpu): used by the on-TPU
# smoke tests (tests/test_flash_tpu.py) that guard kernels no CPU-suite
# config compiles — everything else runs on the forced-CPU fake mesh.
if os.environ.get("VPT_TEST_BACKEND", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")
    # The harness exports JAX_PLATFORMS=axon; cli._honor_jax_platforms_env
    # faithfully RE-applies the env var, which in a fresh pytest process
    # (no jax op before the first cli.main call) would re-select the
    # tunneled TPU for CLI-invoking tests. Pin the env to cpu so the CLI's
    # re-apply agrees with the backend forced above.
    os.environ["JAX_PLATFORMS"] = "cpu"
