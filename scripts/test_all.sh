#!/usr/bin/env bash
# Full default test tier with the environment the suite needs on this image:
# - 256 MB stack: XLA:CPU overflows the default 8 MB compiling/serializing
#   the deep ladder graphs (segfaults in backend_compile_and_load and in
#   compilation-cache read/write at compilation_cache.py:238/:265).
# - CPU cache writes re-enabled (safe with the big stack) so repeat runs
#   reuse compiled kernels.
# - CPU backend forced via shell env (sitecustomize registers the TPU
#   tunnel before any in-script env can take effect).
# Run ONE python at a time on this box — concurrent interpreters contend
# for the TPU tunnel and stall each other.
set -euo pipefail
cd "$(dirname "$0")/.."
ulimit -s 262144 || true
export SNARK_SETUP_CPU_CACHE_WRITES=1
export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"
exec python -m pytest tests/ -q "$@"
