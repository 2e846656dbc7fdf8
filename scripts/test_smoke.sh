#!/usr/bin/env bash
# Smoke tier (VERDICT r1 #5): the fast, pure-host + small-kernel test files.
# Target: green in <2 minutes with a warm compile cache (.jax_cache),
# <6 minutes cold, on the 2-core CPU box. The heavy tier (protocol e2e,
# CLI ceremonies, NTT, phase 2) is everything else:
#   python -m pytest tests/ -q            # full default tier
#   python -m pytest tests/ -q -m slow    # cross-curve sweeps
#
# Run ONE python at a time on this box: every interpreter claims the TPU
# tunnel via sitecustomize, and concurrent processes contend (multi-minute
# stalls that look like hangs).
set -euo pipefail
cd "$(dirname "$0")/.."
# XLA:CPU overflows the default 8 MB stack COMPILING the deep ladder
# graphs; cache writes stay disabled on CPU (jax_setup default) because
# the executable serializer crashes on them even with the big stack.
ulimit -s 262144 || true
exec python -m pytest \
  tests/test_parameters.py \
  tests/test_golden.py \
  tests/test_transcript.py \
  tests/test_oracle.py \
  tests/test_fp_ops.py \
  tests/test_codec.py \
  -q "$@"
