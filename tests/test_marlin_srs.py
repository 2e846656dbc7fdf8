"""Marlin universal SRS usability — the analog of the reference's ignored
heavyweight test (phase1/tests/marlin.rs:60-153, which builds a SonicKZG10
SRS and proves with it). Here the SRS is exercised directly:

1. KZG10 commit/open/verify over the tau G1 powers (the core operation a
   Marlin SRS exists for);
2. the degree-bound inverse powers are exact inverses:
   e(tau^p G1, tau^{-p} G2) == e(G1, G2);
3. the alpha degree-bound triples are consistent shifted-alpha powers.
"""

import random

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.curves.host import g1_curve, g2_curve
from snark_setup_tpu.curves.pairing import pairing_engine
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)

CURVE = "bls12_377"
POWER = 3


def _marlin_srs():
    params = Phase1Parameters.new_full(CURVE, ProvingSystem.MARLIN, POWER, 8)
    _, out, _, _, _ = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.NO, params
    )
    return (
        Phase1.deserialize(out, UseCompression.NO, CheckForCorrectness.FULL, params),
        params,
    )


def test_marlin_srs_kzg_open_verify():
    spec = get_curve(CURVE)
    acc, _ = _marlin_srs()
    eng = pairing_engine(CURVE)
    g1c, g2c = g1_curve(spec), g2_curve(spec)
    r = spec.r
    rng = random.Random(77)

    # commit to a random polynomial of degree 2^POWER - 1
    coeffs = [rng.randrange(r) for _ in range(1 << POWER)]
    commitment = g1c.msm(acc.tau_powers_g1[: len(coeffs)], coeffs)

    # open at a random z: w(X) = (p(X) - p(z)) / (X - z) via synthetic division
    z = rng.randrange(r)
    p_z = 0
    for c in reversed(coeffs):
        p_z = (p_z * z + c) % r
    w = [0] * (len(coeffs) - 1)
    acc_c = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc_c = (acc_c * z + coeffs[i]) % r
        w[i - 1] = acc_c
    witness = g1c.msm(acc.tau_powers_g1[: len(w)], w)

    # e(C − p(z)·G1, G2) == e(W, tau·G2 − z·G2)
    tau_g2 = acc.tau_powers_g2[1]
    lhs_g1 = g1c.add(commitment, g1c.neg(g1c.mul(g1c.generator, p_z)))
    rhs_g2 = g2c.add(tau_g2, g2c.neg(g2c.mul(g2c.generator, z)))
    assert eng.product_is_one([(lhs_g1, g2c.generator), (g1c.neg(witness), rhs_g2)])

    # a wrong evaluation must not verify
    bad_lhs = g1c.add(commitment, g1c.neg(g1c.mul(g1c.generator, (p_z + 1) % r)))
    assert not eng.product_is_one([(bad_lhs, g2c.generator), (g1c.neg(witness), rhs_g2)])


def test_marlin_degree_bound_inverse_powers():
    spec = get_curve(CURVE)
    acc, params = _marlin_srs()
    eng = pairing_engine(CURVE)
    g1c, g2c = g1_curve(spec), g2_curve(spec)
    n = params.total_size_in_log2
    # tau_g2 layout: [G2, tau·G2, inv_0 .. inv_{n-1}] (computation.rs:195-302)
    assert len(acc.tau_powers_g2) == n + 2
    checked = 0
    for i in range(n):
        p = params.powers_length - 1 - (1 << i) + 2
        if p >= params.powers_length:
            # out of tau_g1 range; the reference skips these too
            # (verification.rs:676-727 filters start <= p < end)
            continue
        checked += 1
        # e(tau^p G1, tau^{-p} G2) == e(G1, G2)
        assert eng.product_is_one(
            [
                (acc.tau_powers_g1[p], acc.tau_powers_g2[2 + i]),
                (g1c.neg(g1c.generator), g2c.generator),
            ]
        )
    assert checked >= n - 1


def test_marlin_alpha_degree_bound_triples():
    spec = get_curve(CURVE)
    acc, params = _marlin_srs()
    eng = pairing_engine(CURVE)
    n = params.total_size_in_log2
    g2_check = (acc.tau_powers_g2[0], acc.tau_powers_g2[1])
    # alpha_g1 layout: [alpha, alpha·tau, alpha·tau^2, then n triples
    # alpha·tau^{d_i}·(1, tau, tau^2)] (computation.rs:286-298)
    assert len(acc.alpha_tau_powers_g1) == 3 + 3 * n
    for i in range(n):
        a0 = acc.alpha_tau_powers_g1[3 + 3 * i]
        a1 = acc.alpha_tau_powers_g1[3 + 3 * i + 1]
        a2 = acc.alpha_tau_powers_g1[3 + 3 * i + 2]
        eng.check_same_ratio((a0, a1), g2_check, "alpha triple ratio 1")
        eng.check_same_ratio((a1, a2), g2_check, "alpha triple ratio 2")
