"""Phase-2 CLI E2E at tiny scale, mirroring
phase2-cli/scripts/phase2_chunked.sh: create circuit → prepare transcript →
new (chunked) → per-chunk contribute/verify by 2 participants → combine →
prove+verify a real statement against combined.params (the test_circuit
bin's acceptance gate).

Each CLI command runs as a SUBPROCESS (like the reference's script-level CI,
.github/workflows/cli.yml): running the ~15-command flow in one interpreter
accumulated enough XLA:CPU compile state to segfault the final prove-time
compile (jax 0.9, backend_compile_and_load). Fresh processes + the
persistent compile cache keep it robust and test real argv parsing."""

import os
import subprocess
import sys

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)

CURVE = "bls12_377"
POWER = 4  # phase-1 powers; TestCircuit needs domain 8, h needs 2*8-1 tau_g1

circuit_main = "snark_setup_tpu.cli.circuit_main"
phase2_main = "snark_setup_tpu.cli.phase2_main"
prepare_main = "snark_setup_tpu.cli.prepare_phase2_main"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_in(tmp_path, module, args):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("SNARK_SETUP_JAX_CACHE", os.path.join(_REPO, ".jax_cache"))
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", module, *args], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
    return proc.returncode


@pytest.fixture(scope="module")
def ceremony_dir(tmp_path_factory):
    """Build a phase-1 response file + circuit + prepared transcript."""
    d = tmp_path_factory.mktemp("phase2cli")
    params = Phase1Parameters.new_full(CURVE, ProvingSystem.GROTH16, POWER, 8)
    _, out, _, _, _ = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.NO, params
    )
    (d / "response").write_bytes(bytes(out))
    (d / "seed1").write_text("cc" * 32)
    (d / "seed2").write_text("dd" * 32)
    return d


def test_phase2_cli_end_to_end(ceremony_dir):
    d = ceremony_dir
    assert run_in(d, circuit_main, ["create", "--curve-kind", CURVE]) == 0
    assert (d / f"testcircuit_{CURVE}").exists()

    assert (
        run_in(
            d,
            prepare_main,
            [
                "--curve-kind", CURVE, "--power", str(POWER), "--batch-size", "8",
                "--phase2-size", "8",
                "--phase2-fname", "transcript", "--response-fname", "response",
            ],
        )
        == 0
    )
    assert (d / "transcript").exists()

    common = ["--curve-kind", CURVE, "--batch-size", "4", "--chunk-size", "4"]
    assert (
        run_in(
            d,
            phase2_main,
            common
            + [
                "new",
                "--challenge-fname", "challenge",
                "--challenge-hash-fname", "challenge.verified.hash",
                "--challenge-list-fname", "new_challenge_list",
                "--phase1-fname", "transcript",
                "--circuit-fname", f"testcircuit_{CURVE}",
            ],
        )
        == 0
    )
    chunks = (d / "new_challenge_list").read_text().split()
    assert chunks, "no chunks emitted"

    response_list = []
    for i, chunk in enumerate(chunks):
        seed = "seed1" if i % 2 == 0 else "seed2"
        seed2 = "seed2" if i % 2 == 0 else "seed1"
        assert (
            run_in(
                d,
                phase2_main,
                common
                + ["--seed", seed, "contribute",
                   "--challenge-fname", chunk,
                   "--challenge-hash-fname", f"{chunk}.hash",
                   "--response-fname", f"response_{i}",
                   "--response-hash-fname", f"response_{i}.hash"],
            )
            == 0
        )
        assert (
            run_in(
                d,
                phase2_main,
                common
                + ["verify",
                   "--challenge-fname", chunk,
                   "--challenge-hash-fname", f"{chunk}.verified.hash",
                   "--response-fname", f"response_{i}",
                   "--response-hash-fname", f"response_{i}.verified.hash",
                   "--new-challenge-fname", f"verified_{i}",
                   "--new-challenge-hash-fname", f"verified_{i}.verified.hash"],
            )
            == 0
        )
        assert (
            run_in(
                d,
                phase2_main,
                common
                + ["--seed", seed2, "contribute",
                   "--challenge-fname", f"verified_{i}",
                   "--challenge-hash-fname", f"verified_{i}.hash",
                   "--response-fname", f"new_response_{i}",
                   "--response-hash-fname", f"new_response_{i}.hash"],
            )
            == 0
        )
        assert (
            run_in(
                d,
                phase2_main,
                common
                + ["verify",
                   "--challenge-fname", f"verified_{i}",
                   "--challenge-hash-fname", f"verified_{i}.verified2.hash",
                   "--response-fname", f"new_response_{i}",
                   "--response-hash-fname", f"new_response_{i}.verified.hash",
                   "--new-challenge-fname", f"verified2_{i}",
                   "--new-challenge-hash-fname", f"verified2_{i}.verified.hash"],
            )
            == 0
        )
        response_list.append(f"new_response_{i}")

    (d / "response_list").write_text("\n".join(response_list) + "\n")
    assert (
        run_in(
            d,
            phase2_main,
            common
            + ["combine",
               "--response-list-fname", "response_list",
               "--initial-query-fname", "challenge.query",
               "--initial-full-fname", "challenge.full",
               "--combined-fname", "combined"],
        )
        == 0
    )
    assert (d / "combined.params").exists()

    # acceptance gate: prove + verify against the combined proving key
    assert (
        run_in(
            d,
            circuit_main,
            ["test", "--curve-kind", CURVE, "--proving-key-path", "combined.params"],
        )
        == 0
    )
