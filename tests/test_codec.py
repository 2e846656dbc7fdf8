"""Batch point codec vs the host arkworks-encoding oracle.

Mirrors the reference io round-trip tests (setup-utils/src/io/mod.rs:23-121)
and the decompress round-trip (accumulator.rs:352-388)."""

import random

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.curves.host import INFINITY, g1_curve, g2_curve
from snark_setup_tpu.ops.codec_jax import batch_codec
from snark_setup_tpu.serialize.arkworks import g1_codec, g2_codec
from snark_setup_tpu.utils.enums import CheckForCorrectness, UseCompression
from snark_setup_tpu.utils.errors import PointAtInfinityError, SerializationError

CURVE = "bls12_377"


def _points(grp, n, seed=3, with_inf=True):
    spec = get_curve(CURVE)
    hc = g1_curve(spec) if grp == "g1" else g2_curve(spec)
    rng = random.Random(seed)
    pts = [hc.mul(hc.generator, rng.randrange(spec.r)) for _ in range(n)]
    if with_inf:
        pts[n // 2] = INFINITY
    return spec, hc, pts


@pytest.mark.parametrize("grp", ["g1", "g2"])
@pytest.mark.parametrize(
    "compression", [UseCompression.YES, UseCompression.NO], ids=["comp", "unc"]
)
def test_roundtrip_matches_host_codec(grp, compression):
    spec, hc, pts = _points(grp, 5)
    hostc = g1_codec(spec) if grp == "g1" else g2_codec(spec)
    wire = b"".join(hostc.serialize(p, compression) for p in pts)

    dc = batch_codec(CURVE, grp)
    dev = dc.read_batch(wire, compression, CheckForCorrectness.NO)
    # device -> host points
    assert dc.ops.to_affine_host(dev) == pts
    # device re-serialization is byte-identical
    assert dc.write_batch(dev, compression, normalized=True) == wire


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_recompress_cross(grp):
    """uncompressed -> device -> compressed equals host compressed bytes."""
    spec, hc, pts = _points(grp, 4, seed=9)
    hostc = g1_codec(spec) if grp == "g1" else g2_codec(spec)
    unc = b"".join(hostc.serialize(p, UseCompression.NO) for p in pts)
    comp = b"".join(hostc.serialize(p, UseCompression.YES) for p in pts)
    dc = batch_codec(CURVE, grp)
    dev = dc.read_batch(unc, UseCompression.NO)
    assert dc.write_batch(dev, UseCompression.YES, normalized=True) == comp
    dev2 = dc.read_batch(comp, UseCompression.YES)
    assert dc.write_batch(dev2, UseCompression.NO, normalized=True) == unc


def test_nonzero_check_rejects_infinity():
    spec, hc, pts = _points("g1", 4)
    hostc = g1_codec(spec)
    wire = b"".join(hostc.serialize(p, UseCompression.YES) for p in pts)
    dc = batch_codec(CURVE, "g1")
    with pytest.raises(PointAtInfinityError):
        dc.read_batch(wire, UseCompression.YES, CheckForCorrectness.ONLY_NON_ZERO)


def test_range_check_rejects_out_of_field():
    spec, hc, pts = _points("g1", 2, with_inf=False)
    hostc = g1_codec(spec)
    wire = bytearray(b"".join(hostc.serialize(p, UseCompression.NO) for p in pts))
    wire[: spec.fp_bytes] = b"\xff" * spec.fp_bytes  # x >= q
    dc = batch_codec(CURVE, "g1")
    with pytest.raises(SerializationError):
        dc.read_batch(bytes(wire), UseCompression.NO)


def test_padding_is_ignored_by_validation():
    spec, hc, pts = _points("g1", 3, with_inf=False)
    hostc = g1_codec(spec)
    wire = b"".join(hostc.serialize(p, UseCompression.YES) for p in pts)
    dc = batch_codec(CURVE, "g1")
    dev = dc.read_batch(
        wire, UseCompression.YES, CheckForCorrectness.ONLY_NON_ZERO, pad_to=8
    )
    assert dc.ops.to_affine_host(dev)[:3] == pts
    out = dc.write_batch(dev, UseCompression.YES, normalized=True, n_valid=3)
    assert out == wire
