#!/usr/bin/env bash
# Full default test tier with the environment the suite needs on this image:
# - One pytest PROCESS PER TEST FILE: XLA:CPU corrupts its heap on some of
#   the deep ladder compiles and a LATER unrelated compile then segfaults
#   (observed: a trivial select op crashing in backend_compile_and_load
#   after earlier big compiles; every affected file passes in isolation).
#   Per-file processes contain the corruption.
# - 256 MB stack: the deep-graph compiles also overflow the default 8 MB.
# - CPU cache writes stay DISABLED (jax_setup default): the executable
#   serializer crashes on these graphs even with the big stack.
# - CPU backend forced via shell env (sitecustomize registers the TPU
#   tunnel before any in-script env can take effect).
# Run ONE instance at a time on this box — concurrent interpreters contend
# for the TPU tunnel and stall each other.
#
# Usage: scripts/test_all.sh [extra pytest args...]
set -uo pipefail
cd "$(dirname "$0")/.."
ulimit -s 262144 || true
export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

fail=0
retries=0
retried_files=""
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -eq 139 ] || [ $rc -eq 134 ]; then
    # XLA:CPU's nondeterministic heap corruption during the big ladder
    # compiles (KNOWN_ISSUES.md #3): one LOUD, COUNTED retry in a fresh
    # process; only a REPEAT crash (or a real test failure) fails the run
    echo "RETRY after crash (rc=$rc): $f"
    retries=$((retries + 1))
    retried_files="$retried_files $f"
    python -m pytest "$f" -q "$@"
    rc=$?
  fi
  if [ $rc -ne 0 ]; then
    echo "FAILED: $f (rc=$rc)"
    fail=1
  fi
done
echo "==============================================="
if [ $retries -gt 0 ]; then
  echo "CRASH RETRIES: $retries ($retried_files) — XLA:CPU heap corruption,"
  echo "see KNOWN_ISSUES.md #3. A green run with retries is still a pass,"
  echo "but the count must stay visible."
else
  echo "CRASH RETRIES: 0"
fi
exit $fail
