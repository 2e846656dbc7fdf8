"""Point-vector (de)serialization helpers for phase-2 wire formats.

ark-serialize 0.4 conventions (SURVEY §2.9.4): Vec<Affine> is a u64
little-endian length prefix followed by the elements; single elements are
bare. Batched byte<->point conversion runs through the device codec
(ops/codec_jax.py) so large query vectors never take the per-element host
path.
"""

from __future__ import annotations

from ..curves.constants import CurveSpec
from ..curves.host import AffinePoint
from ..ops.codec_jax import batch_codec
from ..serialize.arkworks import g1_codec, g2_codec
from ..utils.enums import CheckForCorrectness, SubgroupCheckMode, UseCompression


class Cursor:
    """Minimal reader over bytes-like data."""

    def __init__(self, data, pos: int = 0):
        self.data = memoryview(data)
        self.pos = pos

    def take(self, n: int) -> bytes:
        out = bytes(self.data[self.pos : self.pos + n])
        if len(out) != n:
            raise EOFError(f"expected {n} bytes, got {len(out)}")
        self.pos += n
        return out

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "little")

    def skip(self, n: int) -> None:
        self.pos += n


def _codec_pair(spec: CurveSpec, group: str):
    host = g1_codec(spec) if group == "g1" else g2_codec(spec)
    dev = batch_codec(spec.name, group)
    return host, dev


def ser_element(spec: CurveSpec, group: str, p: AffinePoint, compression: UseCompression) -> bytes:
    host, _ = _codec_pair(spec, group)
    return host.serialize(p, compression)


def deser_element(
    spec: CurveSpec, group: str, cur: Cursor, compression: UseCompression, check: CheckForCorrectness
) -> AffinePoint:
    host, _ = _codec_pair(spec, group)
    return host.deserialize(cur.take(host.size(compression)), compression, check)


def ser_vec(
    spec: CurveSpec,
    group: str,
    pts: list[AffinePoint],
    compression: UseCompression,
    prefix: bool = True,
) -> bytes:
    """u64-LE-length-prefixed (or exact) vector of points, device-batched."""
    head = len(pts).to_bytes(8, "little") if prefix else b""
    if not pts:
        return head
    _, dev = _codec_pair(spec, group)
    body = dev.write_batch(
        dev.ops.from_affine_host(pts), compression, normalized=True
    )
    return head + body


def deser_vec(
    spec: CurveSpec,
    group: str,
    cur: Cursor,
    compression: UseCompression,
    check: CheckForCorrectness,
    count: int | None = None,
    subgroup_mode: SubgroupCheckMode = SubgroupCheckMode.AUTO,
) -> list[AffinePoint]:
    """Read `count` points (or a u64-prefixed vector when count is None)."""
    n = cur.u64() if count is None else count
    if n == 0:
        return []
    _, dev = _codec_pair(spec, group)
    raw = cur.take(n * dev.size(compression))
    pts = dev.read_batch(raw, compression, check, subgroup_mode=subgroup_mode)
    return dev.ops.to_affine_host(pts)


def skip_vec(spec: CurveSpec, group: str, cur: Cursor, compression: UseCompression) -> int:
    """Skip a u64-prefixed vector; returns its element count
    (chunked_groth16.rs:376-381)."""
    _, dev = _codec_pair(spec, group)
    n = cur.u64()
    cur.skip(n * dev.size(compression))
    return n
