"""Test configuration: force an 8-virtual-device CPU mesh so sharding tests
run without TPU hardware.

Env vars are NOT enough on this image: sitecustomize registers the tunneled
axon TPU plugin at interpreter start and force-sets jax.config.jax_platforms
to "axon,cpu", so jax is already imported and configured before conftest
runs. Under that default the whole round-1 suite silently ran across the TPU
tunnel — one multi-second round trip per dispatch, plus sporadic multi-minute
tunnel stalls. jax.config.update() after import (but before any backend
initialization) is the reliable override. A persistent XLA compilation cache
amortizes the scan-kernel compiles across runs."""

import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (before snark_setup_tpu so configure_jax sees cache env)

jax.config.update("jax_platforms", "cpu")

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SNARK_SETUP_JAX_CACHE", os.path.join(_repo, ".jax_cache"))
sys.path.insert(0, _repo)
