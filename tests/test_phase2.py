"""Phase 2 MPC tests mirroring the reference test strategy (SURVEY §4):
keypair serialization (phase2/src/keypair.rs:205-236), QAP dot products
(polynomial.rs:96-178), Groth16Params round-trip (groth16_utils.rs:259-364),
contribute/verify invariants (parameters.rs:687-907), and the cross-phase
mpc.rs acceptance test ending in a real Groth16 proof."""

import random

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.curves.host import g1_curve, g2_curve
from snark_setup_tpu.ntt.domain import Radix2Domain
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.phase2 import groth16
from snark_setup_tpu.phase2.keypair import Keypair, Phase2PublicKey
from snark_setup_tpu.phase2.lagrange import Groth16Params
from snark_setup_tpu.phase2.load_circuit import Matrices
from snark_setup_tpu.phase2.parameters import MPCParameters
from snark_setup_tpu.phase2.polynomial import dot_product_vec, process_matrix
from snark_setup_tpu.phase2.r1cs import ConstraintSystem, TestCircuit, circuit_to_qap
from snark_setup_tpu.transcript.hashing import derive_rng_from_seed
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)
from snark_setup_tpu.utils.errors import NoContributionsError, Phase2Error

CURVE = "bls12_377"


def _accumulator(powers: int, batch: int, compressed=UseCompression.NO):
    params = Phase1Parameters.new_full(CURVE, ProvingSystem.GROTH16, powers, batch)
    _, out, _, _, _ = setup_verify(
        compressed, CheckForCorrectness.NO, compressed, params
    )
    return Phase1.deserialize(out, compressed, CheckForCorrectness.FULL, params)


def test_keypair_serialization_544():
    spec = get_curve(CURVE)
    rng = derive_rng_from_seed(b"phase2-keypair")
    kp = Keypair.new(spec, rng, g1_curve(spec).generator, b"\0" * 64, [])
    data = kp.public_key.write(spec)
    assert len(data) == 544  # 3*96 + 192 + 64 (keypair.rs:227-229)
    assert Phase2PublicKey.size(spec) == 544
    back, _ = Phase2PublicKey.read(spec, data)
    assert back == kp.public_key


def test_dot_product_vs_host():
    spec = get_curve(CURVE)
    from snark_setup_tpu.ops.curve_jax import curve_ops

    ops = curve_ops(CURVE, "g1")
    hc = g1_curve(spec)
    rng = random.Random(3)
    pts = [hc.mul(hc.generator, rng.randrange(1, spec.r)) for _ in range(6)]
    rows = [
        [(rng.randrange(1, spec.r), i) for i in (0, 2, 5)],
        [],
        [(rng.randrange(1, spec.r), 1)],
    ]
    got = dot_product_vec(ops, pts, rows)
    for row, g in zip(rows, got):
        want = hc.msm([pts[i] for _, i in row], [c for c, _ in row])
        assert g == want


def test_process_matrix():
    rows = [[(7, 0), (3, 2)], [(5, 2)]]
    out = process_matrix(rows, 3)
    assert out == [[(7, 0)], [], [(3, 0), (5, 1)]]


def test_groth16_params_roundtrip():
    acc = _accumulator(3, 8)
    for phase2_size in (4, 8):
        gp = Groth16Params.new(
            CURVE,
            phase2_size,
            acc.tau_powers_g1,
            acc.tau_powers_g2,
            acc.alpha_tau_powers_g1,
            acc.beta_tau_powers_g1,
            acc.beta_g2,
        )
        for comp in (UseCompression.NO, UseCompression.YES):
            blob = gp.write(comp)
            back = Groth16Params.read(
                CURVE, blob, comp, CheckForCorrectness.FULL, phase2_size
            )
            assert back == gp


def test_groth16_params_too_large_fails():
    acc = _accumulator(3, 8)
    with pytest.raises(ValueError):
        Groth16Params.new(
            CURVE,
            9,  # domain 16 > 2^3 powers
            acc.tau_powers_g1,
            acc.tau_powers_g2,
            acc.alpha_tau_powers_g1,
            acc.beta_tau_powers_g1,
            acc.beta_g2,
        )


def _generate_ceremony() -> MPCParameters:
    """parameters.rs:857-906 analog: powers 5 accumulator, phase2_size 7."""
    acc = _accumulator(5, 16)
    gp = Groth16Params.new(
        CURVE,
        7,
        acc.tau_powers_g1,
        acc.tau_powers_g2,
        acc.alpha_tau_powers_g1,
        acc.beta_tau_powers_g1,
        acc.beta_g2,
    )
    spec = get_curve(CURVE)
    cs = circuit_to_qap(TestCircuit(), spec.r)
    matrices = Matrices.from_constraint_system(spec, cs)
    return MPCParameters.new(matrices, gp)


@pytest.fixture(scope="module")
def ceremony():
    return _generate_ceremony()


def test_mpc_serialize_roundtrip(ceremony):
    spec = get_curve(CURVE)
    blob = ceremony.write(UseCompression.YES)
    back = MPCParameters.read(spec, blob, UseCompression.YES, CheckForCorrectness.FULL)
    assert back == ceremony


def test_verify_with_self_fails(ceremony):
    with pytest.raises(NoContributionsError):
        ceremony.verify(ceremony)


def test_contribute_and_verify(ceremony):
    rng = derive_rng_from_seed(b"phase2-c1")
    c1 = ceremony.clone()
    c1.contribute(rng)
    ceremony.verify(c1, rlc_rng=random.Random(11))

    # second contribution; verifies against both prior states
    c2 = c1.clone()
    c2.contribute(derive_rng_from_seed(b"phase2-c2"))
    ceremony.verify(c2, rlc_rng=random.Random(12))
    c1.verify(c2, rlc_rng=random.Random(13))

    # tampering with delta breaks verification
    bad = c2.clone()
    spec = get_curve(CURVE)
    bad.params.delta_g1 = g1_curve(spec).mul(bad.params.delta_g1, 2)
    with pytest.raises(Phase2Error):
        c1.verify(bad, rlc_rng=random.Random(14))


def test_matrices_roundtrip():
    spec = get_curve(CURVE)
    cs = circuit_to_qap(TestCircuit(), spec.r)
    m = Matrices.from_constraint_system(spec, cs)
    blob = m.write()
    back = Matrices.read(spec, blob)
    assert back == m
    assert m.num_constraints == 6  # 4 squarings + 2 input-density rows
    assert m.num_instance_variables == 2
    assert m.num_witness_variables == 1


def test_mpc_end_to_end_proof():
    """mpc.rs:28-266 analog (full mode): phase1 -> lagrange -> MPC ->
    2 contributions -> verify -> real Groth16 proof that verifies."""
    spec = get_curve(CURVE)
    counter = ConstraintSystem(spec.r, setup=True)
    TestCircuit().generate_constraints(counter)
    phase2_size = max(
        counter.num_constraints + counter.num_instance_variables,
        counter.num_witness_variables + counter.num_instance_variables,
    )
    domain = Radix2Domain(CURVE, phase2_size)
    powers = domain.log_size
    # batch 16 REUSES the ceremony fixture's batch-16 ladder executable:
    # a fresh batch-4 shape here forced one more big XLA:CPU ladder
    # compile late in the process, which reliably hit the allocator-
    # corruption abort (see scripts/test_all.sh); same coverage, one
    # fewer deep compile, and faster
    acc = _accumulator(powers + 1, 16, UseCompression.YES)
    gp = Groth16Params.new(
        CURVE,
        domain.size,
        acc.tau_powers_g1,
        acc.tau_powers_g2,
        acc.alpha_tau_powers_g1,
        acc.beta_tau_powers_g1,
        acc.beta_g2,
    )
    cs = circuit_to_qap(TestCircuit(), spec.r)
    matrices = Matrices.from_constraint_system(spec, cs)
    mpc = MPCParameters.new(matrices, gp)

    before = mpc.clone()
    mpc.contribute(derive_rng_from_seed(b"mpc-e2e-1"))
    before.verify(mpc, rlc_rng=random.Random(21))

    mpc2 = mpc.clone()
    mpc2.contribute(derive_rng_from_seed(b"mpc-e2e-2"))
    mpc.verify(mpc2, rlc_rng=random.Random(22))

    # the resulting params prove and verify a real statement: 5^2 = 25
    pk = mpc2.params
    proof = groth16.prove(spec, pk, TestCircuit(5), derive_rng_from_seed(b"prover"))
    assert groth16.verify(spec, pk.vk, proof, [25])
    assert not groth16.verify(spec, pk.vk, proof, [26])


def test_prepare_device_matches_host():
    """The device-resident prepare path (bounded reads -> on-device IFFT ->
    bounded writes; no Python point vectors) is byte-identical to
    Groth16Params.new().write() (VERDICT r4 #4)."""
    from snark_setup_tpu.phase2.lagrange import prepare_transcript_device

    params = Phase1Parameters.new_full(CURVE, ProvingSystem.GROTH16, 3, 8)
    _, out, _, _, _ = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.NO, params
    )
    acc = Phase1.deserialize(out, UseCompression.NO, CheckForCorrectness.NO, params)
    for phase2_size in (4, 8):
        gp = Groth16Params.new(
            CURVE,
            phase2_size,
            acc.tau_powers_g1,
            acc.tau_powers_g2,
            acc.alpha_tau_powers_g1,
            acc.beta_tau_powers_g1,
            acc.beta_g2,
        )
        expect = gp.write(UseCompression.NO)
        got = prepare_transcript_device(CURVE, phase2_size, bytes(out), params)
        assert got == expect, f"device prepare differs at phase2_size={phase2_size}"
