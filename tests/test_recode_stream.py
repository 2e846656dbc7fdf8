"""Bounded-batch streaming of section recode + compressed reads
(VERDICT r4 #3): combine/split/decompress and read_batch must never issue
one device graph over a whole section. Exercised by shrinking
MAX_DEVICE_BATCH below the section size so the slicing logic runs with
several batches (the real 2^13 boundary is measured hardware data,
BASELINE.md r4).
"""

import pytest

from snark_setup_tpu.ops.codec_jax import BatchPointCodec, batch_codec
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import setup_verify
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    UseCompression,
)
from snark_setup_tpu.utils.errors import Error

POWER = 4  # tau_g1 section = 31 elements > the shrunken bound below
BATCH = 8


@pytest.fixture(scope="module")
def compressed_contribution():
    params = Phase1Parameters.new_full(
        "bls12_377", ProvingSystem.GROTH16, POWER, BATCH
    )
    inp, out, pubkey, privkey, digest = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.YES, params
    )
    return params, bytes(out)


def test_streamed_decompress_matches_whole(compressed_contribution, monkeypatch):
    params, out = compressed_contribution
    expect = bytearray(params.get_length(UseCompression.NO))
    Phase1.decompress(out, expect, CheckForCorrectness.NO, params)

    monkeypatch.setattr(BatchPointCodec, "MAX_DEVICE_BATCH", 8)
    got = bytearray(params.get_length(UseCompression.NO))
    Phase1.decompress(out, got, CheckForCorrectness.NO, params)
    assert bytes(got[64:]) == bytes(expect[64:])


def test_streamed_decompress_rejects_tamper(compressed_contribution, monkeypatch):
    params, out = compressed_contribution
    monkeypatch.setattr(BatchPointCodec, "MAX_DEVICE_BATCH", 8)
    bad = bytearray(out)
    # corrupt element ~20 of 31 (inside a LATER slice of the streamed
    # recode) with a deterministically-invalid encoding: both flag bits
    # set (a random x flip could land on another valid square root)
    bad[64 + 20 * 48 + 47] |= 0xC0
    with pytest.raises(Error):
        Phase1.decompress(
            bytes(bad),
            bytearray(params.get_length(UseCompression.NO)),
            CheckForCorrectness.NO,
            params,
        )


def test_bounded_compressed_read_matches_whole(compressed_contribution, monkeypatch):
    params, out = compressed_contribution
    codec = batch_codec("bls12_377", "g1")
    sec = 31 * 48  # whole tau_g1 section, compressed
    data = out[64 : 64 + sec]
    whole = codec.read_batch(data, UseCompression.YES, CheckForCorrectness.NO)
    aff_whole = codec.ops.to_affine_host(whole)

    monkeypatch.setattr(BatchPointCodec, "MAX_DEVICE_BATCH", 8)
    sliced = codec.read_batch(data, UseCompression.YES, CheckForCorrectness.NO)
    aff_sliced = codec.ops.to_affine_host(sliced)
    assert aff_whole == aff_sliced
