#!/bin/bash -e
# Chunked phase-1 ceremony chained into prepare_phase2: produces a Lagrange
# transcript file consumable by scripts/phase2_chunked.sh.
# Mirrors phase1-cli/scripts/phase1_chunked_prepare_phase2.sh (with that
# script's wart fixed: prepare_phase2 reads the UNCOMPRESSED verified
# new-challenge, not the compressed beacon response).
#
# Output: $OUT (default ./phase1_transcript in the repo root).
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORM_NAME="${JAX_PLATFORM_NAME:-cpu}" JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

PROVING_SYSTEM=${PROVING_SYSTEM:-groth16}
POWER=${POWER:-4}
BATCH=${BATCH:-16}
CHUNK_SIZE=${CHUNK_SIZE:-16}
CURVE=${CURVE:-bls12_377}
PHASE2_SIZE=${PHASE2_SIZE:-$((2 ** POWER))}
OUT=${OUT:-$REPO/phase1_transcript}
PHASE1_BIN=${PHASE1_BIN:-"python -m snark_setup_tpu.cli.phase1_main"}

WORK=$(mktemp -d /tmp/phase1_prepare.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

if [ "$PROVING_SYSTEM" == "groth16" ]; then
  TOTAL=$((2 ** (POWER + 1) - 1))
else
  TOTAL=$((2 ** POWER))
fi
MAX_CHUNK_INDEX=$(((TOTAL + CHUNK_SIZE - 1) / CHUNK_SIZE - 1))

tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed1
tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed2

check_hash() {
  test "$(xxd -p -c 64 "$1.hash")" = "$(b2sum "$1" | awk '{print $1}')"
}

phase1_1="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --power $POWER --seed seed1 --proving-system $PROVING_SYSTEM"
phase1_2="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --power $POWER --seed seed2 --proving-system $PROVING_SYSTEM"
phase1_combine="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --power $POWER --proving-system $PROVING_SYSTEM"
phase1_full="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode full --power $POWER --proving-system $PROVING_SYSTEM"

for i in $(seq 0 $MAX_CHUNK_INDEX); do
  echo "Contributing and verifying chunk $i..."
  if [ $((i % 2)) -eq 0 ]; then c1="$phase1_1"; c2="$phase1_2"; else c1="$phase1_2"; c2="$phase1_1"; fi
  $phase1_1 --chunk-index "$i" new --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.verified.hash"
  $c1 --chunk-index "$i" contribute --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.hash" --response-fname "response_$i" --response-hash-fname "response_$i.hash"
  check_hash "challenge_$i"
  check_hash "response_$i"
  $c2 --chunk-index "$i" verify-and-transform-pok-and-correctness --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.verified.hash" --response-fname "response_$i" --response-hash-fname "response_$i.verified.hash" --new-challenge-fname "new_challenge_$i" --new-challenge-hash-fname "new_challenge_$i.verified.hash"
  $c2 --chunk-index "$i" contribute --challenge-fname "new_challenge_$i" --challenge-hash-fname "new_challenge_$i.hash" --response-fname "new_response_$i" --response-hash-fname "new_response_$i.hash"
  check_hash "new_challenge_$i"
  check_hash "new_response_$i"
  $c1 --chunk-index "$i" verify-and-transform-pok-and-correctness --challenge-fname "new_challenge_$i" --challenge-hash-fname "new_challenge_$i.verified.hash" --response-fname "new_response_$i" --response-hash-fname "new_response_$i.verified.hash" --new-challenge-fname "new_new_challenge_$i" --new-challenge-hash-fname "new_new_challenge_$i.verified.hash"
  rm "challenge_$i" "new_challenge_$i" "new_new_challenge_$i"
  echo "new_response_$i" >> response_list
done

echo "Aggregating..."
$phase1_combine combine --response-list-fname response_list --combined-fname combined
echo "Applying beacon..."
$phase1_full beacon --challenge-fname combined --response-fname response_beacon --beacon-hash 0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620
echo "Verifying..."
$phase1_full verify-and-transform-pok-and-correctness --challenge-fname combined --challenge-hash-fname combined.verified.hash --response-fname response_beacon --response-hash-fname response_beacon.verified.hash --new-challenge-fname response_beacon_new_challenge --new-challenge-hash-fname response_beacon_new_challenge.verified.hash
$phase1_full verify-and-transform-ratios --response-fname response_beacon_new_challenge
echo "Running prepare_phase2..."
rm -f "$OUT"
python -m snark_setup_tpu.cli.prepare_phase2_main --curve-kind "$CURVE" --batch-size "$BATCH" --power "$POWER" --proving-system "$PROVING_SYSTEM" --phase2-size "$PHASE2_SIZE" --phase2-fname "$OUT" --response-fname response_beacon_new_challenge
echo "Done! Transcript at $OUT"
