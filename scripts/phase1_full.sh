#!/bin/bash -e
# Full-mode (non-chunked) phase-1 ceremony: one participant + beacon + full
# verification + ratio check. Mirrors phase1-cli/scripts/phase1_full.sh.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORM_NAME="${JAX_PLATFORM_NAME:-cpu}" JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
export SNARK_SETUP_JAX_CACHE="${SNARK_SETUP_JAX_CACHE:-$PWD/.jax_cache}"

WORK=$(mktemp -d /tmp/phase1_full.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

PROVING_SYSTEM=${PROVING_SYSTEM:-groth16}
POWER=${POWER:-3}
BATCH=${BATCH:-8}
CURVE=${CURVE:-bls12_377}
PHASE1_BIN=${PHASE1_BIN:-"python -m snark_setup_tpu.cli.phase1_main"}

tr -dc 'A-F0-9' < /dev/urandom | head -c32 > seed1

check_hash() {
  test "$(xxd -p -c 64 "$1.hash")" = "$(b2sum "$1" | awk '{print $1}')"
}

phase1="$PHASE1_BIN --curve-kind $CURVE --batch-size $BATCH --contribution-mode full --power $POWER --seed seed1 --proving-system $PROVING_SYSTEM"

$phase1 new --challenge-fname challenge --challenge-hash-fname challenge.verified.hash
echo "Contributing..."
$phase1 contribute --challenge-fname challenge --challenge-hash-fname challenge.hash --response-fname response --response-hash-fname response.hash
check_hash challenge
check_hash response
echo "Verifying..."
$phase1 verify-and-transform-pok-and-correctness --challenge-fname challenge --challenge-hash-fname challenge.verified.hash --response-fname response --response-hash-fname response.verified.hash --new-challenge-fname new_challenge --new-challenge-hash-fname new_challenge.verified.hash
echo "Applying beacon..."
$phase1 beacon --challenge-fname new_challenge --challenge-hash-fname new_challenge.hash --response-fname new_response --response-hash-fname new_response.hash --beacon-hash 0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620
echo "Verifying..."
$phase1 verify-and-transform-pok-and-correctness --challenge-fname new_challenge --challenge-hash-fname new_challenge.verified.hash --response-fname new_response --response-hash-fname new_response.verified.hash --new-challenge-fname new_challenge_2 --new-challenge-hash-fname new_challenge_2.verified.hash
$phase1 verify-and-transform-ratios --response-fname new_challenge_2
echo "Done!"
