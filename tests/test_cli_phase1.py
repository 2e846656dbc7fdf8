"""CLI E2E: the reference's shell-script ceremonies (phase1_full.sh,
phase1_chunked.sh) run in-process at tiny power — new → contribute → verify
→ beacon → verify → ratios, plus the chunked combine/split round trip.

Every file handoff checks the .hash side files like the scripts' b2sum
cross-check (phase1_chunked.sh:23-25)."""

import hashlib
import os

import pytest

from snark_setup_tpu.cli import phase1_cmds
from snark_setup_tpu.cli.phase1_main import main as phase1_main
from snark_setup_tpu.utils.errors import Error

POWER = 3
BATCH = 4
CHUNK = 4
CURVE = "bls12_377"

BEACON = "0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620"


def check_hash(path):
    with open(path + ".hash" if not path.endswith(".hash") else path, "rb") as f:
        recorded = f.read()
    with open(path, "rb") as f:
        actual = hashlib.blake2b(f.read()).digest()
    assert recorded == actual, f"hash side-file mismatch for {path}"


def run(args, cwd):
    old = os.getcwd()
    os.chdir(cwd)
    try:
        rc = phase1_main(args)
    finally:
        os.chdir(old)
    return rc


def common_flags(mode="full", chunk_index=None):
    flags = [
        "--curve-kind", CURVE, "--batch-size", str(BATCH), "--power", str(POWER),
        "--proving-system", "groth16", "--contribution-mode", mode,
    ]
    if mode == "chunked":
        flags += ["--chunk-size", str(CHUNK)]
    if chunk_index is not None:
        flags += ["--chunk-index", str(chunk_index)]
    return flags


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "seed1").write_text("aa" * 32)
    (tmp_path / "seed2").write_text("bb" * 32)
    return tmp_path


def test_full_ceremony(workdir):
    f = common_flags("full")
    assert run(f + ["new", "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.verified.hash"], workdir) == 0
    assert run(f + ["--seed", "seed1", "contribute",
                    "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.hash",
                    "--response-fname", "response",
                    "--response-hash-fname", "response.hash"], workdir) == 0
    check_hash(str(workdir / "challenge"))
    check_hash(str(workdir / "response"))
    assert run(f + ["verify-and-transform-pok-and-correctness",
                    "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.verified.hash",
                    "--response-fname", "response",
                    "--response-hash-fname", "response.verified.hash",
                    "--new-challenge-fname", "new_challenge",
                    "--new-challenge-hash-fname", "new_challenge.verified.hash"], workdir) == 0
    assert run(f + ["beacon", "--challenge-fname", "new_challenge",
                    "--challenge-hash-fname", "new_challenge.hash",
                    "--response-fname", "new_response",
                    "--response-hash-fname", "new_response.hash",
                    "--beacon-hash", BEACON], workdir) == 0
    assert run(f + ["verify-and-transform-pok-and-correctness",
                    "--challenge-fname", "new_challenge",
                    "--challenge-hash-fname", "new_challenge.verified.hash",
                    "--response-fname", "new_response",
                    "--response-hash-fname", "new_response.verified.hash",
                    "--new-challenge-fname", "new_challenge_2",
                    "--new-challenge-hash-fname", "new_challenge_2.verified.hash"], workdir) == 0
    assert run(f + ["verify-and-transform-ratios",
                    "--response-fname", "new_challenge_2"], workdir) == 0

    # hash chain: response[0..64) == H(challenge)
    challenge = (workdir / "challenge").read_bytes()
    response = (workdir / "response").read_bytes()
    assert response[:64] == hashlib.blake2b(challenge).digest()


def test_chunked_ceremony_combine_split(workdir):
    # 2^4-1 = 15 G1 powers at POWER=3 -> 4 chunks of size 4.
    # Every chunk receives the SAME two contributors (tau accumulates
    # identically across chunks — required for combine consistency), as in
    # phase1_chunked.sh where seed1 and seed2 each touch every chunk.
    num_chunks = 4
    for i in range(num_chunks):
        fi = common_flags("chunked", i)
        assert run(fi + ["new", "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.verified.hash"], workdir) == 0
        assert run(fi + ["--seed", "seed1", "contribute",
                         "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.hash",
                         "--response-fname", f"response_{i}",
                         "--response-hash-fname", f"response_{i}.hash"], workdir) == 0
        check_hash(str(workdir / f"challenge_{i}"))
        check_hash(str(workdir / f"response_{i}"))
        assert run(fi + ["verify-and-transform-pok-and-correctness",
                         "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.verified.hash",
                         "--response-fname", f"response_{i}",
                         "--response-hash-fname", f"response_{i}.verified.hash",
                         "--new-challenge-fname", f"new_challenge_{i}",
                         "--new-challenge-hash-fname", f"new_challenge_{i}.verified.hash"],
                   workdir) == 0
        assert run(fi + ["--seed", "seed2", "contribute",
                         "--challenge-fname", f"new_challenge_{i}",
                         "--challenge-hash-fname", f"new_challenge_{i}.hash",
                         "--response-fname", f"new_response_{i}",
                         "--response-hash-fname", f"new_response_{i}.hash"], workdir) == 0
        assert run(fi + ["verify-and-transform-pok-and-correctness",
                         "--challenge-fname", f"new_challenge_{i}",
                         "--challenge-hash-fname", f"new_challenge_{i}.verified.hash",
                         "--response-fname", f"new_response_{i}",
                         "--response-hash-fname", f"new_response_{i}.verified.hash",
                         "--new-challenge-fname", f"new_new_challenge_{i}",
                         "--new-challenge-hash-fname",
                         f"new_new_challenge_{i}.verified.hash"], workdir) == 0

    (workdir / "response_list").write_text(
        "".join(f"new_response_{i}\n" for i in range(num_chunks))
    )
    fc = common_flags("chunked")
    assert run(fc + ["combine", "--response-list-fname", "response_list",
                     "--combined-fname", "combined"], workdir) == 0

    # beacon on the combined full accumulator
    ff = common_flags("full")
    assert run(ff + ["beacon", "--challenge-fname", "combined",
                     "--challenge-hash-fname", "combined.hash",
                     "--response-fname", "response_beacon",
                     "--response-hash-fname", "response_beacon.hash",
                     "--beacon-hash", BEACON], workdir) == 0
    assert run(ff + ["verify-and-transform-pok-and-correctness",
                     "--challenge-fname", "combined",
                     "--challenge-hash-fname", "combined.verified.hash",
                     "--response-fname", "response_beacon",
                     "--response-hash-fname", "response_beacon.verified.hash",
                     "--new-challenge-fname", "response_beacon_new_challenge",
                     "--new-challenge-hash-fname",
                     "response_beacon_new_challenge.verified.hash"], workdir) == 0
    assert run(ff + ["verify-and-transform-ratios",
                     "--response-fname", "response_beacon_new_challenge"], workdir) == 0

    # split the beacon response back into chunks and re-contribute to chunk 0
    assert run(fc + ["split", "--chunk-fname-prefix", "chunk_split",
                     "--full-fname", "response_beacon"], workdir) == 0
    f0 = common_flags("chunked", 0)
    assert run(f0 + ["--seed", "seed2", "contribute",
                     "--challenge-fname", "chunk_split_0",
                     "--challenge-hash-fname", "chunk_split_0.hash",
                     "--response-fname", "response_split_0",
                     "--response-hash-fname", "response_split_0.hash"], workdir) == 0
    assert run(f0 + ["verify-and-transform-pok-and-correctness",
                     "--challenge-fname", "chunk_split_0",
                     "--challenge-hash-fname", "chunk_split_0.verified.hash",
                     "--response-fname", "response_split_0",
                     "--response-hash-fname", "response_split_0.verified.hash",
                     "--new-challenge-fname", "new_challenge_split_0",
                     "--new-challenge-hash-fname",
                     "new_challenge_split_0.verified.hash"], workdir) == 0


def test_hash_chain_failure_detected(workdir):
    f = common_flags("full")
    run(f + ["new", "--challenge-fname", "challenge",
             "--challenge-hash-fname", "challenge.verified.hash"], workdir)
    run(f + ["--seed", "seed1", "contribute", "--challenge-fname", "challenge",
             "--challenge-hash-fname", "challenge.hash",
             "--response-fname", "response",
             "--response-hash-fname", "response.hash"], workdir)
    # corrupt the embedded chain hash
    p = workdir / "response"
    data = bytearray(p.read_bytes())
    data[0] ^= 0xFF
    p.write_bytes(bytes(data))
    rc = run(f + ["verify-and-transform-pok-and-correctness",
                  "--challenge-fname", "challenge",
                  "--challenge-hash-fname", "challenge.verified.hash",
                  "--response-fname", "response",
                  "--response-hash-fname", "response.verified.hash",
                  "--new-challenge-fname", "new_challenge",
                  "--new-challenge-hash-fname", "new_challenge.verified.hash"], workdir)
    assert rc == 1
