#!/bin/bash -e
# Single-contribution timing at ceremony scale (reference benchmark.sh:
# power 27, batch 2^21, BW6-761). Defaults are scaled down for the single
# tunneled TPU chip; override POWER/BATCH/CURVE for full-scale runs.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

POWER=${POWER:-16}
BATCH=${BATCH:-$((2 ** 14))}
CURVE=${CURVE:-bw6}
PHASE1_BIN=${PHASE1_BIN:-"python -m snark_setup_tpu.cli.phase1_main"}

WORK=$(mktemp -d /tmp/phase1_bench.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed1

phase1="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --power $POWER --seed seed1 --contribution-mode chunked --chunk-size $BATCH"

$phase1 --chunk-index 0 new --challenge-fname challenge_0
time $phase1 --chunk-index 0 contribute --challenge-fname challenge_0 --response-fname response_0
