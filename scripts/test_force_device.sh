#!/usr/bin/env bash
# Force-device lane (weekly tier, VERDICT r4 #7): runs the device graphs
# that CPU backends normally bypass via host fallback — msm_secret, the
# Direct subgroup mask, phase-2 batch_mul — under XLA:CPU with
# SNARK_SETUP_FORCE_DEVICE_MSM=1, checking equivalence against host math.
# Expect minutes of ladder compiles; the same crash-retry containment as
# test_all.sh applies (KNOWN_ISSUES.md #3).
set -uo pipefail
cd "$(dirname "$0")/.."
ulimit -s 262144 || true
export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

python -m pytest tests/test_force_device.py -q -m slow --override-ini 'addopts=' "$@"
rc=$?
if [ $rc -eq 139 ] || [ $rc -eq 134 ]; then
  echo "RETRY after crash (rc=$rc)"
  python -m pytest tests/test_force_device.py -q -m slow --override-ini 'addopts=' "$@"
  rc=$?
fi
exit $rc
