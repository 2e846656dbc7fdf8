"""Cross-curve / cross-proving-system / cross-compression e2e tier
(VERDICT r4 #8) — the runnable analog of the reference CI matrix
(.github/workflows/cli.yml:30-40 runs groth16 AND marlin scripts on
BW6-761; phase2/tests/mpc.rs:212-235 sweeps five curves;
phase1/src/computation.rs:311-538 sweeps compression combos).

Slow-marked: the big-field curves force fresh deep XLA:CPU ladder
compiles per curve. Run with
  python -m pytest tests/test_cli_matrix.py -m slow --override-ini addopts=
"""

import hashlib
import os

import pytest

from snark_setup_tpu.cli.phase1_main import main as phase1_main

pytestmark = pytest.mark.slow

POWER = 3
BATCH = 4
BEACON = "0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620"


def run(args, cwd):
    old = os.getcwd()
    os.chdir(cwd)
    try:
        return phase1_main(args)
    finally:
        os.chdir(old)


def flags(curve, proving, mode="full", chunk_index=None, chunk=4):
    out = [
        "--curve-kind", curve, "--batch-size", str(BATCH), "--power", str(POWER),
        "--proving-system", proving, "--contribution-mode", mode,
    ]
    if mode == "chunked":
        out += ["--chunk-size", str(chunk)]
    if chunk_index is not None:
        out += ["--chunk-index", str(chunk_index)]
    return out


def _full_ceremony(workdir, curve, proving):
    (workdir / "seed1").write_text("aa" * 32)
    f = flags(curve, proving)
    assert run(f + ["new", "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.verified.hash"], workdir) == 0
    assert run(f + ["--seed", "seed1", "contribute",
                    "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.hash",
                    "--response-fname", "response",
                    "--response-hash-fname", "response.hash"], workdir) == 0
    assert run(f + ["verify-and-transform-pok-and-correctness",
                    "--challenge-fname", "challenge",
                    "--challenge-hash-fname", "challenge.verified.hash",
                    "--response-fname", "response",
                    "--response-hash-fname", "response.verified.hash",
                    "--new-challenge-fname", "new_challenge",
                    "--new-challenge-hash-fname", "new_challenge.verified.hash"], workdir) == 0
    assert run(f + ["verify-and-transform-ratios",
                    "--response-fname", "new_challenge"], workdir) == 0
    challenge = (workdir / "challenge").read_bytes()
    response = (workdir / "response").read_bytes()
    assert response[:64] == hashlib.blake2b(challenge).digest()


@pytest.mark.parametrize(
    "curve,proving",
    [
        ("bw6_761", "groth16"),   # the reference's CI curve
        ("mnt4_753", "groth16"),  # 753-bit, no GLV endomorphism path
        ("mnt6_753", "groth16"),
    ],
)
def test_full_ceremony_cross_curve(tmp_path, curve, proving):
    _full_ceremony(tmp_path, curve, proving)


def test_marlin_chunked_cli_ceremony(tmp_path):
    """Marlin through the CLI surface (the reference CI runs the marlin
    scripts; in-process protocol coverage lives in
    test_chunked_marlin_protocol.py): per-chunk new -> contribute ->
    verify-transform, then combine + aggregate ratio transform."""
    workdir = tmp_path
    (workdir / "seed1").write_text("aa" * 32)
    curve, proving = "bls12_377", "marlin"
    num_chunks = 2  # 2^3 tau powers / chunk 4
    for i in range(num_chunks):
        fi = flags(curve, proving, "chunked", i)
        assert run(fi + ["new", "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.verified.hash"], workdir) == 0
        assert run(fi + ["--seed", "seed1", "contribute",
                         "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.hash",
                         "--response-fname", f"response_{i}",
                         "--response-hash-fname", f"response_{i}.hash"], workdir) == 0
        assert run(fi + ["verify-and-transform-pok-and-correctness",
                         "--challenge-fname", f"challenge_{i}",
                         "--challenge-hash-fname", f"challenge_{i}.verified.hash",
                         "--response-fname", f"response_{i}",
                         "--response-hash-fname", f"response_{i}.verified.hash",
                         "--new-challenge-fname", f"new_challenge_{i}",
                         "--new-challenge-hash-fname",
                         f"new_challenge_{i}.verified.hash"], workdir) == 0
    (workdir / "response_list").write_text(
        "".join(f"response_{i}\n" for i in range(num_chunks))
    )
    fc = flags(curve, proving, "chunked")
    assert run(fc + ["combine", "--response-list-fname", "response_list",
                     "--combined-fname", "combined"], workdir) == 0
    ff = flags(curve, proving)
    assert run(ff + ["verify-and-transform-ratios",
                     "--response-fname", "combined"], workdir) == 0


def test_compression_sweep_protocol():
    """Compression-combo sweep of computation+verification at protocol
    level (the reference's computation.rs tests iterate all four combos;
    the default tier runs only uncompressed-in/compressed-out)."""
    import random

    from snark_setup_tpu.phase1.parameters import Phase1Parameters
    from snark_setup_tpu.phase1.protocol import Phase1
    from snark_setup_tpu.phase1.testing import generate_output, setup_verify
    from snark_setup_tpu.utils.enums import (
        CheckForCorrectness,
        ProvingSystem,
        SubgroupCheckMode,
        UseCompression,
    )

    params = Phase1Parameters.new_full(
        "bls12_377", ProvingSystem.GROTH16, POWER, BATCH
    )
    for comp_in in (UseCompression.NO, UseCompression.YES):
        for comp_out in (UseCompression.NO, UseCompression.YES):
            inp, out, pubkey, privkey, digest = setup_verify(
                comp_in, CheckForCorrectness.NO, comp_out, params,
                seed=f"sweep-{comp_in}-{comp_out}".encode(),
            )
            new_challenge = generate_output(params, UseCompression.NO)
            Phase1.verification(
                inp, out, new_challenge, pubkey, digest,
                comp_in, comp_out, UseCompression.NO,
                CheckForCorrectness.NO, CheckForCorrectness.FULL,
                SubgroupCheckMode.AUTO, True, params,
                rlc_rng=random.Random(9),
            )
