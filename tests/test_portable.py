"""Portable (JAX-free) phase-2 contributor vs the TPU stack.

Twin of the reference wasm contributor coverage (phase2/src/lib.rs:15-66):
the portable module must (a) run with jax import-blocked — proving the
participant path is accelerator-free — and (b) produce a response the
coordinator-side MPCParameters.verify accepts byte-for-byte."""

import random
import subprocess
import sys

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.phase2.lagrange import Groth16Params
from snark_setup_tpu.phase2.load_circuit import Matrices
from snark_setup_tpu.phase2.parameters import MPCParameters
from snark_setup_tpu.phase2.r1cs import TestCircuit, circuit_to_qap
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)

CURVE = "bls12_377"


@pytest.fixture(scope="module")
def ceremony():
    params = Phase1Parameters.new_full(CURVE, ProvingSystem.GROTH16, 5, 16)
    _, out, _, _, _ = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.NO, params
    )
    acc = Phase1.deserialize(out, UseCompression.NO, CheckForCorrectness.NO, params)
    gp = Groth16Params.new(
        CURVE, 7, acc.tau_powers_g1, acc.tau_powers_g2,
        acc.alpha_tau_powers_g1, acc.beta_tau_powers_g1, acc.beta_g2,
    )
    spec = get_curve(CURVE)
    matrices = Matrices.from_constraint_system(spec, circuit_to_qap(TestCircuit(), spec.r))
    return MPCParameters.new(matrices, gp)


def test_portable_contribution_verifies(ceremony, tmp_path):
    """Challenge written by the coordinator -> portable contribution in a
    subprocess with jax IMPORT-BLOCKED -> coordinator verifies."""
    spec = get_curve(CURVE)
    challenge = tmp_path / "challenge"
    response = tmp_path / "response"
    seed_file = tmp_path / "seed"
    challenge.write_bytes(ceremony.write(UseCompression.NO))
    seed_file.write_text((b"portable-seed-1" + b"\0" * 17).hex())

    code = (
        "import sys\n"
        "sys.modules['jax'] = None  # any jax import now raises\n"
        "from snark_setup_tpu.portable.contributor import _main\n"
        f"rc = _main([{str(challenge)!r}, {str(response)!r}, "
        f"'--curve', 'inner', '--seed-file', {str(seed_file)!r}])\n"
        "assert 'jax' not in sys.modules or sys.modules['jax'] is None\n"
        "sys.exit(rc)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr
    contrib_hash = bytes.fromhex(proc.stdout.strip())
    assert len(contrib_hash) == 64

    after = MPCParameters.read(
        spec, response.read_bytes(), UseCompression.YES, CheckForCorrectness.NO
    )
    hashes = ceremony.verify(after, rlc_rng=random.Random(31))
    assert hashes[-1] == contrib_hash


def test_portable_matches_device_contribute(ceremony):
    """Same seed through the portable path and MPCParameters.contribute must
    give byte-identical parameters (the portable path IS the protocol, not
    an approximation)."""
    from snark_setup_tpu.portable import contribute_challenge
    from snark_setup_tpu.transcript.hashing import derive_rng_from_seed

    seed = b"portable-seed-2" + b"\0" * 17
    resp, h = contribute_challenge(
        ceremony.write(UseCompression.NO), "inner", seed=seed
    )
    dev = ceremony.clone()
    h_dev = dev.contribute(derive_rng_from_seed(seed))
    assert h == h_dev
    assert resp == dev.write(UseCompression.YES)
