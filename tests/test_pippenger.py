"""Pippenger bucket-MSM vs host bigint oracle (ops/pippenger.py).

Covers both RLC widths (128-bit and full Fr width), signed-digit recoding,
lane padding, and infinity handling. G2 (Fp2 coordinates) is slow-marked:
its compile dominates the smoke tier budget on the 2-core CPU box.
"""

import random

import numpy as np
import pytest

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.ops.msm import msm_public, rlc_scalars_padded
from snark_setup_tpu.ops.pippenger import PippengerMSM, signed_digits_host


def test_signed_digit_recoding_roundtrip():
    rnd = random.Random(1)
    for bits, L in ((128, 8), (253, 16)):
        ks = [rnd.randrange(1 << bits) for _ in range(50)] + [0, 1, (1 << bits) - 1]
        sc = np.ascontiguousarray(ints_to_limbs_batch(ks, L).T)
        idx, neg = signed_digits_host(sc, bits, c=8)
        for col, k in enumerate(ks):
            v = 0
            for w in range(idx.shape[0]):
                d = -int(idx[w, col]) if neg[w, col] else int(idx[w, col])
                v += d << (8 * w)
            assert v == k


def _check(group, nbits, L, B=24):
    ops = curve_ops("bls12_377", group)
    hc = ops.host_curve
    rnd = random.Random(42)
    base = [hc.mul(hc.generator, rnd.randrange(1, ops.spec.r)) for _ in range(B - 1)]
    from snark_setup_tpu.curves.host import INFINITY

    base.append(INFINITY)
    pts = ops.from_affine_host(base)
    ks = [rnd.randrange(1 << nbits) for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, L).T)
    msm = PippengerMSM(ops, B, nbits, c=8)
    got = ops.to_affine_host(msm(pts, sc))[0]
    expect = None
    for p, k in zip(base, ks):
        t = hc.mul(p, k % ops.spec.r)
        expect = t if expect is None else hc.add(expect, t)
    assert got == expect


def test_pippenger_g1_128bit():
    _check("g1", 128, 8)


def test_pippenger_g1_fullwidth():
    _check("g1", 253, 16)


@pytest.mark.slow
def test_pippenger_g2():
    _check("g2", 128, 8)
