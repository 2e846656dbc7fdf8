#!/usr/bin/env bash
# Full default test tier with the environment the suite needs on this image:
# - 256 MB stack: XLA:CPU's COMPILE of the deep ladder graphs overflows the
#   default 8 MB stack (segfault in backend_compile_and_load).
# - CPU cache writes stay DISABLED (jax_setup default): the executable
#   SERIALIZER crashes on these graphs even with the big stack
#   (compilation_cache.py:265) — measured, not stack-curable.
# - CPU backend forced via shell env (sitecustomize registers the TPU
#   tunnel before any in-script env can take effect).
# Run ONE python at a time on this box — concurrent interpreters contend
# for the TPU tunnel and stall each other.
set -euo pipefail
cd "$(dirname "$0")/.."
ulimit -s 262144 || true
export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"
exec python -m pytest tests/ -q "$@"
