#!/bin/bash -e
# Two-participant chunked phase-1 ceremony: per-chunk contribute/verify by
# alternating participants, combine, beacon, full verify, ratio check, then
# split and a second contribution round over the split chunks.
# Mirrors phase1-cli/scripts/phase1_chunked.sh (the reference's CI E2E test).
#
# Env overrides: PROVING_SYSTEM, POWER, BATCH, CHUNK_SIZE, CURVE, PHASE1_BIN.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORM_NAME="${JAX_PLATFORM_NAME:-cpu}" JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

WORK=$(mktemp -d /tmp/phase1_chunked.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

PROVING_SYSTEM=${PROVING_SYSTEM:-groth16}
POWER=${POWER:-3}
BATCH=${BATCH:-8}
CHUNK_SIZE=${CHUNK_SIZE:-4}
CURVE=${CURVE:-bls12_377}
PHASE1_BIN=${PHASE1_BIN:-"python -m snark_setup_tpu.cli.phase1_main"}

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

contribute_round() { # chunk_index contributor verifier challenge_prefix response_prefix list_file
  local i=$1 c1=$2 c2=$3 chal=$4 resp=$5 list=$6
  $c1 --chunk-index "$i" contribute --challenge-fname "${chal}_$i" --challenge-hash-fname "${chal}_$i.hash" --response-fname "${resp}_$i" --response-hash-fname "${resp}_$i.hash"
  check_hash "${chal}_$i"
  check_hash "${resp}_$i"
  $c2 --chunk-index "$i" verify-and-transform-pok-and-correctness --challenge-fname "${chal}_$i" --challenge-hash-fname "${chal}_$i.verified.hash" --response-fname "${resp}_$i" --response-hash-fname "${resp}_$i.verified.hash" --new-challenge-fname "new_${chal}_$i" --new-challenge-hash-fname "new_${chal}_$i.verified.hash"
  $c2 --chunk-index "$i" contribute --challenge-fname "new_${chal}_$i" --challenge-hash-fname "new_${chal}_$i.hash" --response-fname "new_${resp}_$i" --response-hash-fname "new_${resp}_$i.hash"
  check_hash "new_${chal}_$i"
  check_hash "new_${resp}_$i"
  $c1 --chunk-index "$i" verify-and-transform-pok-and-correctness --challenge-fname "new_${chal}_$i" --challenge-hash-fname "new_${chal}_$i.verified.hash" --response-fname "new_${resp}_$i" --response-hash-fname "new_${resp}_$i.verified.hash" --new-challenge-fname "new_new_${chal}_$i" --new-challenge-hash-fname "new_new_${chal}_$i.verified.hash"
  rm "${chal}_$i" "new_${chal}_$i" "new_new_${chal}_$i"
  echo "new_${resp}_$i" >> "$list"
}

for i in $(seq 0 $MAX_CHUNK_INDEX); do
  echo "Contributing and verifying chunk $i..."
  $phase1_1 --chunk-index "$i" new --challenge-fname "challenge_$i" --challenge-hash-fname "challenge_$i.verified.hash"
  if [ $((i % 2)) -eq 0 ]; then
    contribute_round "$i" "$phase1_1" "$phase1_2" challenge response response_list
  else
    contribute_round "$i" "$phase1_2" "$phase1_1" challenge response response_list
  fi
done

echo "Aggregating..."
$phase1_combine combine --response-list-fname response_list --combined-fname combined
echo "Applying beacon..."
$phase1_full beacon --challenge-fname combined --response-fname response_beacon --beacon-hash 0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620
echo "Verifying..."
$phase1_full verify-and-transform-pok-and-correctness --challenge-fname combined --challenge-hash-fname combined.verified.hash --response-fname response_beacon --response-hash-fname response_beacon.verified.hash --new-challenge-fname response_beacon_new_challenge --new-challenge-hash-fname response_beacon_new_challenge.verified.hash
$phase1_full verify-and-transform-ratios --response-fname response_beacon_new_challenge

echo "Splitting and re-contributing..."
$phase1_combine split --chunk-fname-prefix chunk_split --full-fname response_beacon_new_challenge

for i in $(seq 0 $MAX_CHUNK_INDEX); do
  if [ $((i % 2)) -eq 0 ]; then
    contribute_round "$i" "$phase1_1" "$phase1_2" chunk_split response_split response_list_split
  else
    contribute_round "$i" "$phase1_2" "$phase1_1" chunk_split response_split response_list_split
  fi
done

$phase1_combine combine --response-list-fname response_list_split --combined-fname combined_split
$phase1_full beacon --challenge-fname combined_split --response-fname response_beacon_split --beacon-hash 0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620
$phase1_full verify-and-transform-pok-and-correctness --challenge-fname combined_split --challenge-hash-fname combined_split.verified.hash --response-fname response_beacon_split --response-hash-fname response_beacon_split.verified.hash --new-challenge-fname response_beacon_new_challenge_split --new-challenge-hash-fname response_beacon_new_challenge_split.verified.hash
$phase1_full verify-and-transform-ratios --response-fname response_beacon_new_challenge_split
echo "Done!"
