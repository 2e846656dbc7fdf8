"""Subgroup-check policy tests (SubgroupCheckMode Direct/Batched/Auto).

The reference accepts a Batched flag but silently falls back to Direct
(phase1/src/helpers/accumulator.rs:109-139 PITODO); here the batched
random-linear-combination check is real, so it needs the coverage the
reference never had: a positive path through Phase1.verification and a
negative path with an on-curve point outside the prime-order subgroup.
"""

import random

import pytest

from snark_setup_tpu.curves.host import g1_curve
from snark_setup_tpu.ops.codec_jax import batch_codec
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1, _check_subgroup_device
from snark_setup_tpu.phase1.testing import generate_output, setup_verify
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    SubgroupCheckMode,
    UseCompression,
)
from snark_setup_tpu.utils.errors import IncorrectSubgroupError

POWER = 3
BATCH = 4


def _out_of_subgroup_point(spec):
    """Smallest-x curve point NOT in the order-r subgroup (cofactor > 1 on
    every supported G1, so low-x points are almost never in the subgroup)."""
    hc = g1_curve(spec)
    for x in range(1, 2000):
        p = hc.get_point_from_x(spec.fp(x), greatest=False)
        if p is not None and not hc.in_subgroup(p):
            return p
    raise AssertionError("no out-of-subgroup point found")


def test_batched_subgroup_check_through_verification():
    params = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, POWER, BATCH)
    inp, out, pubkey, privkey, digest = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.YES, params
    )
    new_challenge = generate_output(params, UseCompression.NO)
    Phase1.verification(
        inp, out, new_challenge, pubkey, digest,
        UseCompression.NO, UseCompression.YES, UseCompression.NO,
        CheckForCorrectness.NO, CheckForCorrectness.FULL,
        SubgroupCheckMode.BATCHED, True, params, rlc_rng=random.Random(7),
    )
    after = Phase1.deserialize(out, UseCompression.YES, CheckForCorrectness.NO, params)
    decompressed = Phase1.deserialize(
        new_challenge, UseCompression.NO, CheckForCorrectness.NO, params
    )
    assert decompressed == after


@pytest.mark.parametrize("mode", [SubgroupCheckMode.DIRECT, SubgroupCheckMode.BATCHED])
def test_subgroup_check_rejects_out_of_subgroup_point(mode):
    codec = batch_codec("bls12_377", "g1")
    spec = codec.spec
    hc = g1_curve(spec)
    bad = _out_of_subgroup_point(spec)
    good = [hc.mul(hc.generator, 5 + i) for i in range(3)]
    # padded batch (as the verification hot loop produces): 4 valid + padding
    pts = codec.ops.from_affine_host(good + [bad] + [bad] * 0)
    from snark_setup_tpu.curves.host import INFINITY

    pts = codec.ops.from_affine_host(good + [bad, INFINITY, INFINITY])
    with pytest.raises(IncorrectSubgroupError):
        _check_subgroup_device(codec, pts, mode, n=4)


@pytest.mark.parametrize("mode", [SubgroupCheckMode.DIRECT, SubgroupCheckMode.BATCHED])
def test_subgroup_check_accepts_subgroup_points(mode):
    codec = batch_codec("bls12_377", "g1")
    hc = g1_curve(codec.spec)
    from snark_setup_tpu.curves.host import INFINITY

    pts = codec.ops.from_affine_host(
        [hc.mul(hc.generator, 5 + i) for i in range(4)] + [INFINITY, INFINITY]
    )
    _check_subgroup_device(codec, pts, mode, n=4)
