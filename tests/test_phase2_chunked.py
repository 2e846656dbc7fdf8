"""Chunked (streaming) phase 2: buffer-level contribute/verify
(phase2/src/chunked_groth16.rs) and the chunked-mode mpc.rs e2e path
(new_chunked -> per-chunk contribute -> combine -> streaming verify ->
real proof)."""

import random

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.ntt.domain import Radix2Domain
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.phase2 import chunked, groth16
from snark_setup_tpu.phase2.keypair import Phase2PublicKey
from snark_setup_tpu.phase2.lagrange import Groth16Params
from snark_setup_tpu.phase2.load_circuit import Matrices
from snark_setup_tpu.phase2.parameters import MPCParameters
from snark_setup_tpu.phase2.r1cs import ConstraintSystem, TestCircuit, circuit_to_qap
from snark_setup_tpu.transcript.hashing import derive_rng_from_seed
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)

CURVE = "bls12_377"


def _groth16_params(phase2_size: int):
    domain = Radix2Domain(CURVE, phase2_size)
    powers = domain.log_size + 1
    params = Phase1Parameters.new_full(CURVE, ProvingSystem.GROTH16, powers, 4)
    _, out, _, _, _ = setup_verify(
        UseCompression.YES, CheckForCorrectness.NO, UseCompression.YES, params
    )
    acc = Phase1.deserialize(out, UseCompression.YES, CheckForCorrectness.FULL, params)
    return Groth16Params.new(
        CURVE,
        domain.size,
        acc.tau_powers_g1,
        acc.tau_powers_g2,
        acc.alpha_tau_powers_g1,
        acc.beta_tau_powers_g1,
        acc.beta_g2,
    )


def test_chunked_contribute_verify_roundtrip():
    """parameters.rs:749-853 analog driven through the streaming API."""
    spec = get_curve(CURVE)
    cs = circuit_to_qap(TestCircuit(), spec.r)
    matrices = Matrices.from_constraint_system(spec, cs)
    gp = _groth16_params(
        max(cs.num_constraints, cs.num_instance_variables + cs.num_witness_variables)
    )
    mpc = MPCParameters.new(matrices, gp)
    mpc_serialized = mpc.write(UseCompression.YES)

    # contribution 1 via the in-memory API
    c1 = mpc.clone()
    c1.contribute(derive_rng_from_seed(b"chunked-1"))
    c1_serialized = c1.write(UseCompression.YES)
    chunked.verify(
        spec,
        mpc_serialized,
        c1_serialized,
        4,
        UseCompression.YES,
        CheckForCorrectness.FULL,
        rlc_rng=random.Random(31),
    )

    # contribution 2 via the streaming API, in place
    c2_buf = bytearray(c1_serialized)
    c2_buf.extend(b"\0" * Phase2PublicKey.size(spec))
    chunked.contribute(
        spec,
        c2_buf,
        derive_rng_from_seed(b"chunked-2"),
        4,
        UseCompression.YES,
        CheckForCorrectness.FULL,
    )
    chunked.verify(
        spec, c1_serialized, c2_buf, 4, UseCompression.YES, CheckForCorrectness.FULL,
        rlc_rng=random.Random(32),
    )
    chunked.verify(
        spec, mpc_serialized, c2_buf, 4, UseCompression.YES, CheckForCorrectness.FULL,
        rlc_rng=random.Random(33),
    )

    # the streamed buffer parses back and cross-verifies with the object API
    c2 = MPCParameters.read(spec, c2_buf, UseCompression.YES, CheckForCorrectness.FULL)
    mpc.verify(c2, rlc_rng=random.Random(34))
    c1.verify(c2, rlc_rng=random.Random(35))


def test_mpc_end_to_end_chunked_proof():
    """mpc.rs:109-207 analog: chunked MPC, per-chunk contributions,
    combine, streaming verify, then a real proof."""
    spec = get_curve(CURVE)
    counter = ConstraintSystem(spec.r, setup=True)
    TestCircuit().generate_constraints(counter)
    phase2_size = max(
        counter.num_constraints + counter.num_instance_variables,
        counter.num_witness_variables + counter.num_instance_variables,
    )
    gp = _groth16_params(phase2_size)
    cs = circuit_to_qap(TestCircuit(), spec.r)
    matrices = Matrices.from_constraint_system(spec, cs)
    domain_size = Radix2Domain(CURVE, phase2_size).size
    chunk_size = domain_size // 3

    full_before, queries, mpcs = MPCParameters.new_chunked(matrices, gp, chunk_size)
    full_before_ser = full_before.write(UseCompression.YES)

    for i, mpc in enumerate(mpcs):
        before = mpc.clone()
        mpc.contribute(derive_rng_from_seed(b"\0" * 32))
        before.verify(mpc, rlc_rng=random.Random(40 + i))

    full_after = MPCParameters.combine(spec, queries, mpcs)
    full_after_ser = full_after.write(UseCompression.YES)
    chunked.verify(
        spec,
        full_before_ser,
        full_after_ser,
        3,
        UseCompression.YES,
        CheckForCorrectness.FULL,
        rlc_rng=random.Random(50),
    )

    pk = full_after.params
    proof = groth16.prove(spec, pk, TestCircuit(5), derive_rng_from_seed(b"prover-chunked"))
    assert groth16.verify(spec, pk.vk, proof, [25])
