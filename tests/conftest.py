"""Test configuration: force an 8-virtual-device CPU mesh so sharding tests
run without TPU hardware (the axon TPU plugin ignores JAX_PLATFORMS, so we
set JAX_PLATFORM_NAME as well — must happen before jax import). A persistent
XLA compilation cache amortizes the large scan-kernel compiles across runs."""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SNARK_SETUP_JAX_CACHE", os.path.join(_repo, ".jax_cache"))
sys.path.insert(0, _repo)
