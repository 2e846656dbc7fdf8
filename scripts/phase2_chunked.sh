#!/bin/bash -e
# Chunked phase-2 ceremony over a prepared phase-1 transcript: new (chunked
# challenges from circuit + transcript), per-chunk contribute/verify by two
# participants, combine, and a final prove/verify acceptance gate.
# Mirrors phase2-cli/scripts/phase2_chunked.sh + the test_circuit bin.
#
# Requires: $PHASE1_TRANSCRIPT (made by scripts/phase1_chunked_prepare_phase2.sh)
# and $CIRCUIT (made by `python -m snark_setup_tpu.cli.circuit_main create`).
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORM_NAME="${JAX_PLATFORM_NAME:-cpu}" JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

CURVE=${CURVE:-bls12_377}
BATCH=${BATCH:-64}
CHUNK_SIZE=${CHUNK_SIZE:-4}
PHASE1_TRANSCRIPT=${PHASE1_TRANSCRIPT:?path to prepared phase-1 transcript}
CIRCUIT=${CIRCUIT:?path to serialized circuit matrices}
PHASE2_BIN=${PHASE2_BIN:-"python -m snark_setup_tpu.cli.phase2_main"}

WORK=$(mktemp -d /tmp/phase2_chunked.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
cp "$PHASE1_TRANSCRIPT" "$WORK/phase1_transcript"
cp "$CIRCUIT" "$WORK/circuit.constraints"
cd "$WORK"

tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed1
tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed2

check_hash() {
  test "$(xxd -p -c 64 "$1.hash")" = "$(b2sum "$1" | awk '{print $1}')"
}

phase2_c="$PHASE2_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode full --chunk-size $CHUNK_SIZE"
phase2_1="$PHASE2_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --seed seed1"
phase2_2="$PHASE2_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode chunked --chunk-size $CHUNK_SIZE --seed seed2"

$phase2_c new --challenge-fname challenge --challenge-hash-fname challenge.verified.hash --challenge-list-fname new_challenge_list --phase1-fname phase1_transcript --circuit-fname circuit.constraints

NUM_CHUNKS=$(wc -l < new_challenge_list)
MAX_CHUNK_INDEX=$((NUM_CHUNKS - 1))

for i in $(seq 0 $MAX_CHUNK_INDEX); do
  echo "Contributing and verifying chunk $i..."
  if [ $((i % 2)) -eq 0 ]; then c1="$phase2_1"; c2="$phase2_2"; else c1="$phase2_2"; c2="$phase2_1"; fi
  $c1 --chunk-index "$i" contribute --challenge-fname "challenge.$i" --challenge-hash-fname "challenge.$i.hash" --response-fname "response_$i" --response-hash-fname "response_$i.hash"
  check_hash "challenge.$i"
  check_hash "response_$i"
  $c1 --chunk-index "$i" verify --challenge-fname "challenge.$i" --challenge-hash-fname "challenge_$i.verified.hash" --response-fname "response_$i" --response-hash-fname "response_$i.verified.hash" --new-challenge-fname "verified_$i" --new-challenge-hash-fname "verified_$i.verified.hash"
  $c2 --chunk-index "$i" contribute --challenge-fname "verified_$i" --challenge-hash-fname "verified_$i.hash" --response-fname "new_response_$i" --response-hash-fname "new_response_$i.hash"
  check_hash "new_response_$i"
  $c2 --chunk-index "$i" verify --challenge-fname "verified_$i" --challenge-hash-fname "verified_$i.verified.hash" --response-fname "new_response_$i" --response-hash-fname "new_response_$i.verified.hash" --new-challenge-fname "verified2_$i" --new-challenge-hash-fname "verified2_$i.verified.hash"
  rm "challenge.$i" "response_$i" "verified_$i" "verified2_$i"
  echo "new_response_$i" >> response_list
done

echo "Combining..."
$phase2_c combine --response-list-fname response_list --initial-query-fname challenge.query --initial-full-fname challenge.full --combined-fname combined

echo "Proving and verifying a real circuit against combined.params..."
python -m snark_setup_tpu.cli.circuit_main test --curve-kind "$CURVE" --proving-key-path combined.params
echo "Done!"
