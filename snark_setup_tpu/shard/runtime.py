"""Mesh integration of the ceremony engine (SURVEY §2.3; VERDICT r4 #1).

This module is the production call site of the i-range sharding: when more
than one accelerator device is visible, `Phase1.computation` /
`Phase1.verification` (and the phase-2 batched scalar-mul path) route their
per-batch device work through jits whose batch axis is sharded over a 1-D
`jax.sharding.Mesh` — the TPU-native analog of the reference's chunked
multi-worker aggregation (phase1/src/aggregation.rs:11-352), applied
*inside* one participant's computation.

Design notes:
- The tau^i batch axis is embarrassingly parallel in computation (zero
  collectives) and reduction-only in verification (per-shard partial MSMs
  all-gathered as single points), so a pure data-parallel PartitionSpec on
  the LAST axis (limbs-leading layout, fp_jax.py) is the whole story; XLA's
  GSPMD partitioner inserts the collectives.
- Batches are padded (with infinity points / zero scalars) to a multiple of
  the mesh size so every shard is even; the pad rows are dropped at
  write-back (`n_valid`), so output bytes are identical to the
  single-device path — proven by tests/test_shard_protocol.py.
- Policy: sharding activates automatically on multi-device non-CPU
  backends; on CPU it is OPT-IN via SNARK_SETUP_SHARD=1 (the default test
  suite runs an 8-virtual-device CPU mesh where sharding every tiny batch
  would only slow the fragile XLA:CPU compiles down). SNARK_SETUP_SHARD=0
  force-disables everywhere; SNARK_SETUP_SHARD_DEVICES=n bounds the mesh.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.curve_jax import CurveOps, PointVec

_MESH_UNSET = object()
_mesh_cache = _MESH_UNSET


def _shard_flag() -> str:
    return os.environ.get("SNARK_SETUP_SHARD", "auto").lower()


def reset_mesh_cache() -> None:
    """Drop the cached mesh decision (tests flip env vars at runtime)."""
    global _mesh_cache
    _mesh_cache = _MESH_UNSET
    _sharded_mul_cache.clear()
    _put_cache.clear()


def active_mesh():
    """The 1-D ceremony mesh, or None when running single-device.

    Cached after the first call: the device topology and the policy env
    vars are fixed for the life of a process (tests use
    reset_mesh_cache)."""
    global _mesh_cache
    if _mesh_cache is not _MESH_UNSET:
        return _mesh_cache
    _mesh_cache = _decide_mesh()
    return _mesh_cache


def _decide_mesh():
    import jax
    from jax.sharding import Mesh

    flag = _shard_flag()
    if flag in ("0", "off", "false"):
        return None
    try:
        devs = jax.devices()
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - uninitialized backend
        return None
    if flag == "auto" and backend == "cpu":
        return None
    n = len(devs)
    bound = os.environ.get("SNARK_SETUP_SHARD_DEVICES")
    if bound:
        n = min(n, int(bound))
    # even sharding wants a power-of-two shard count (batch pads stay small
    # and the NTT path needs it); use the largest 2-power available
    while n & (n - 1):
        n &= n - 1
    if n < 2:
        return None
    return Mesh(np.array(devs[:n]), ("i",))


def mesh_size() -> int:
    m = active_mesh()
    return 1 if m is None else m.devices.size


def pad_width(pad: int) -> int:
    """Round a batch pad size up to a multiple of the mesh size so the
    batch axis shards evenly. Identity when single-device."""
    n = mesh_size()
    return -(-pad // n) * n


def _specs(ops: CurveOps):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = active_mesh()
    el_rank = 1 if ops.field.degree == 1 else 2
    pspec = P(*([None] * el_rank), "i")
    point = NamedSharding(mesh, pspec)
    scalar = NamedSharding(mesh, P(None, "i"))
    return point, scalar


_put_cache: dict = {}


def put_points(ops: CurveOps, pts: PointVec) -> PointVec:
    """Distribute a point batch over the mesh (no-op single-device)."""
    if active_mesh() is None:
        return pts
    import jax

    point, _ = _specs(ops)
    return PointVec(
        {k: jax.device_put(v, point) for k, v in pts.items()}
    )


def put_scalars(ops: CurveOps, scalars) -> np.ndarray:
    if active_mesh() is None:
        return scalars
    import jax

    _, scalar = _specs(ops)
    return jax.device_put(scalars, scalar)


_sharded_mul_cache: dict = {}

SCALAR_MUL_MAX_LANES = 1 << 14
"""Widest batch any single scalar-mul trace may span. Measured on v5e
(2026-08-22): the GLV decomposition graph returns WRONG half-scalars for
every lane at batch 32768/32769 while 16384, 24576, 49152 and 65536/65537
are host-oracle-correct — a shape-specific silent miscompile in the same
XLA wide-graph family the codec guards against (codec_jax
.MAX_DEVICE_BATCH). A ceremony tool cannot trust per-shape luck, so
scalar_mul slices its batch into <= 2^14-lane sub-traces INSIDE one jit
(one dispatch; every sub-graph stays at a validated shape).
SNARK_SETUP_SCALAR_MUL_MAX_LANES overrides for experiments;
benches/repro_widegraph.py reprints the measurement."""


def _max_lanes() -> int:
    return int(
        os.environ.get("SNARK_SETUP_SCALAR_MUL_MAX_LANES", str(SCALAR_MUL_MAX_LANES))
    )


def scalar_mul(ops: CurveOps, pts: PointVec, scalars_raw):
    """The contribution hot loop's batch scalar-mul, sharded over the mesh
    when one is active (replaces the plain jit in phase1/protocol.py).
    Elementwise over the batch axis: GSPMD partitions it with zero
    collectives; each shard runs the same fused GLV ladder kernels.
    Batches wider than SCALAR_MUL_MAX_LANES are sliced inside the jit."""
    import jax
    import jax.numpy as jnp

    mesh = active_mesh()
    B = int(pts["x"].shape[-1])
    M = _max_lanes()
    key = (id(ops), B if B > M else 0)
    if key not in _sharded_mul_cache:
        if B > M:

            def sliced(p, s):
                outs = [
                    dict(
                        ops.scalar_mul(
                            PointVec(
                                {k: v[..., lo : lo + M] for k, v in p.items()}
                            ),
                            s[..., lo : lo + M],
                        )
                    )
                    for lo in range(0, B, M)
                ]
                return PointVec(
                    {
                        k: jnp.concatenate([o[k] for o in outs], axis=-1)
                        for k in ("x", "y", "z")
                    }
                )

            base = sliced
        else:
            base = ops.scalar_mul
        if mesh is None:
            _sharded_mul_cache[key] = jax.jit(base)
        else:
            point, scalar = _specs(ops)
            _sharded_mul_cache[key] = jax.jit(
                base,
                in_shardings=(
                    PointVec(x=point, y=point, z=point),
                    scalar,
                ),
                out_shardings=PointVec(x=point, y=point, z=point),
            )
    return _sharded_mul_cache[key](pts, scalars_raw)
