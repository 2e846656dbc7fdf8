#!/bin/bash -e
# Scale-geometry proof run (VERDICT r1 #10): single-participant chunked
# phase-1 ceremony at production powers on the real TPU — per-chunk
# new/contribute/verify-transform, combine, full aggregate ratio check —
# with wall-clock per phase recorded to $LOG.
#
# Mirrors the shapes of the reference's benchmark.sh (power 27, batch 2^21)
# scaled to one tunneled chip: default POWER=20, BATCH=2^16, CHUNK=2^18.
# Env overrides: POWER, BATCH, CHUNK_SIZE, CURVE, WORKDIR (kept if set), LOG.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

POWER=${POWER:-20}
BATCH=${BATCH:-$((2 ** 16))}
CHUNK_SIZE=${CHUNK_SIZE:-$((2 ** 18))}
CURVE=${CURVE:-bls12_377}
PROVING_SYSTEM=${PROVING_SYSTEM:-groth16}
LOG=${LOG:-/tmp/phase1_scale_p${POWER}.log}
PHASE1_BIN=${PHASE1_BIN:-"python -m snark_setup_tpu.cli.phase1_main"}

if [ -n "$WORKDIR" ]; then
  mkdir -p "$WORKDIR"; WORK="$WORKDIR"
else
  WORK=$(mktemp -d /tmp/phase1_scale.XXXXXX)
  trap 'rm -rf "$WORK"' EXIT
fi
cd "$WORK"

TOTAL=$((2 ** (POWER + 1) - 1))
MAX_CHUNK_INDEX=$(((TOTAL + CHUNK_SIZE - 1) / CHUNK_SIZE - 1))

tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed1

phase1="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --power $POWER --seed seed1 --proving-system $PROVING_SYSTEM"
phase1_full="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode full --power $POWER --proving-system $PROVING_SYSTEM"

stamp() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
timed() { # label cmd...
  local label=$1; shift
  local t0=$(date +%s)
  "$@"
  local t1=$(date +%s)
  stamp "$label: $((t1 - t0)) s"
}

stamp "=== phase1 scale run: power=$POWER batch=$BATCH chunk=$CHUNK_SIZE curve=$CURVE chunks=$((MAX_CHUNK_INDEX + 1)) ==="
for i in $(seq 0 $MAX_CHUNK_INDEX); do
  timed "chunk $i new" $phase1 --chunk-index "$i" new \
    --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.verified.hash"
  timed "chunk $i contribute" $phase1 --chunk-index "$i" contribute \
    --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.hash" \
    --response-fname "response_$i" --response-hash-fname "response_$i.hash"
  timed "chunk $i verify-transform" $phase1 --chunk-index "$i" verify-and-transform-pok-and-correctness \
    --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.verified.hash" \
    --response-fname "response_$i" --response-hash-fname "response_$i.verified.hash" \
    --new-challenge-fname "new_challenge_$i" --new-challenge-hash-fname "new_challenge_$i.verified.hash"
  rm -f "challenge_$i" "new_challenge_$i"
  echo "response_$i" >> response_list
done

timed "combine" $phase1 combine --response-list-fname response_list --combined-fname combined
timed "aggregate verify (transform-ratios)" $phase1_full verify-and-transform-ratios --response-fname combined
stamp "=== done; files: $(du -sh . | cut -f1) total in $WORK ==="
