#!/usr/bin/env bash
# Warm the persistent XLA compile cache by running each test file in its
# OWN pytest process, sequentially.
#
# Why: XLA:CPU on this image segfaults after enough large kernel compiles
# accumulate in one process (observed round 2 at the prove-time compile and
# round 3 at the subgroup-ladder compile; the same compiles succeed in a
# fresh process, with or without the cache). With the cache warm, a full
# `pytest tests/` run turns those compiles into loads and is robust. Run
# this once per machine (the cache is keyed per-machine by a cpuinfo-flags
# hash — see ops/jax_setup.py) or after bumping jax.
#
# Crashes of individual files are tolerated: everything compiled before a
# crash is already cached, so a second pass completes. The loop retries
# each file up to 3 times.
set -uo pipefail
cd "$(dirname "$0")/.."
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

fail=0
for f in tests/test_*.py; do
  for attempt in 1 2 3; do
    echo "== $f (attempt $attempt)"
    if python -m pytest "$f" -q; then
      break
    elif [ "$attempt" = 3 ]; then
      echo "!! $f still failing after 3 attempts"
      fail=1
    fi
  done
done
exit $fail
