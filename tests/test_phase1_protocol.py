"""Phase-1 protocol property tests — computation vs recomputed expectation,
verification happy path + fault rejection, serialization round trip.

Mirrors the reference property tests (phase1/src/computation.rs:311-538,
verification.rs:772-1167) at small power so compile time stays bounded."""

import random

import pytest

from snark_setup_tpu.curves.host import g1_curve, g2_curve
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import generate_output, setup_verify
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    SubgroupCheckMode,
    UseCompression,
)
from snark_setup_tpu.utils.errors import Error

POWER = 3
BATCH = 4


@pytest.fixture(scope="module")
def contribution():
    params = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, POWER, BATCH)
    inp, out, pubkey, privkey, digest = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.YES, params
    )
    return params, inp, out, pubkey, privkey, digest


def test_computation_matches_host_oracle(contribution):
    params, inp, out, pubkey, privkey, digest = contribution
    spec = params.spec
    before = Phase1.deserialize(inp, UseCompression.NO, CheckForCorrectness.NO, params)
    after = Phase1.deserialize(out, UseCompression.YES, CheckForCorrectness.NO, params)
    g1c, g2c = g1_curve(spec), g2_curve(spec)
    tau, alpha, beta = privkey.tau, privkey.alpha, privkey.beta
    r = spec.r
    for i in range(params.powers_g1_length):
        assert after.tau_powers_g1[i] == g1c.mul(before.tau_powers_g1[i], pow(tau, i, r))
    for i in range(params.powers_length):
        assert after.tau_powers_g2[i] == g2c.mul(before.tau_powers_g2[i], pow(tau, i, r))
        assert after.alpha_tau_powers_g1[i] == g1c.mul(
            before.alpha_tau_powers_g1[i], alpha * pow(tau, i, r) % r
        )
        assert after.beta_tau_powers_g1[i] == g1c.mul(
            before.beta_tau_powers_g1[i], beta * pow(tau, i, r) % r
        )
    assert after.beta_g2 == g2c.mul(before.beta_g2, beta)


def test_verification_accepts_and_decompresses(contribution):
    params, inp, out, pubkey, privkey, digest = contribution
    new_challenge = generate_output(params, UseCompression.NO)
    Phase1.verification(
        inp, out, new_challenge, pubkey, digest,
        UseCompression.NO, UseCompression.YES, UseCompression.NO,
        CheckForCorrectness.NO, CheckForCorrectness.FULL,
        SubgroupCheckMode.AUTO, True, params, rlc_rng=random.Random(5),
    )
    after = Phase1.deserialize(out, UseCompression.YES, CheckForCorrectness.NO, params)
    decompressed = Phase1.deserialize(
        new_challenge, UseCompression.NO, CheckForCorrectness.NO, params
    )
    assert decompressed == after


def test_verification_rejects_tampered_byte(contribution):
    params, inp, out, pubkey, privkey, digest = contribution
    bad = bytearray(out)
    bad[64 + 10] ^= 0x01
    with pytest.raises(Error):
        Phase1.verification(
            inp, bad, generate_output(params, UseCompression.NO), pubkey, digest,
            UseCompression.NO, UseCompression.YES, UseCompression.NO,
            CheckForCorrectness.NO, CheckForCorrectness.FULL,
            SubgroupCheckMode.AUTO, True, params, rlc_rng=random.Random(5),
        )


def test_verification_rejects_wrong_digest(contribution):
    params, inp, out, pubkey, privkey, digest = contribution
    with pytest.raises(Error):
        Phase1.verification(
            inp, out, generate_output(params, UseCompression.NO), pubkey, b"\x00" * 64,
            UseCompression.NO, UseCompression.YES, UseCompression.NO,
            CheckForCorrectness.NO, CheckForCorrectness.FULL,
            SubgroupCheckMode.AUTO, True, params, rlc_rng=random.Random(5),
        )


def test_serialization_roundtrip(contribution):
    params, inp, out, pubkey, privkey, digest = contribution
    acc = Phase1.deserialize(inp, UseCompression.NO, CheckForCorrectness.NO, params)
    buf = generate_output(params, UseCompression.NO)
    Phase1.serialize_accumulator(acc, buf, UseCompression.NO, params)
    assert bytes(buf[64:]) == bytes(inp[64:])
