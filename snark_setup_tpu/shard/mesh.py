"""Device-mesh sharding of the ceremony hot loops (SURVEY §2.3).

The accumulator index range (the tau^i axis) is the natural data-parallel
axis: elements are independent in `computation`, and MSM/subgroup reductions
combine per-shard partials with O(n_devices) point additions.

Layout note: field elements are (L[, d], B) with the BATCH axis last
(fp_jax.py), so sharding specs put the mesh axis on the last dim — the lane
dimension stays dense on each chip.

Cross-chip reduction note: point sums are group-law additions, NOT integer
adds, so `psum` does not apply; per-shard partial MSMs are all-gathered
(tiny: one point per shard) and tree-reduced with the complete addition
formulas on every chip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.curve_jax import CurveOps, PointVec


def make_mesh(n_devices: int | None = None, axis: str = "i") -> Mesh:
    """1-D mesh over the tau^i index range."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _point_spec(ops: CurveOps, axis: str) -> P:
    """PartitionSpec sharding a coordinate (L[, d], B) on the batch axis."""
    el_rank = 1 if ops.field.degree == 1 else 2
    return P(*([None] * el_rank), axis)


def sharded_batch_exp_fn(ops: CurveOps, mesh: Mesh, axis: str = "i"):
    """jitted (points, scalars) -> points with the batch axis sharded over
    the mesh — the multi-chip `computation` hot loop. Purely elementwise
    across the i-range: zero communication."""
    pspec = _point_spec(ops, axis)
    sspec = P(None, axis)
    pshard = NamedSharding(mesh, pspec)
    sshard = NamedSharding(mesh, sspec)

    f = jax.jit(
        ops.scalar_mul,
        in_shardings=(
            PointVec(x=pshard, y=pshard, z=pshard),
            sshard,
        ),
        out_shardings=PointVec(x=pshard, y=pshard, z=pshard),
    )
    return f


def sharded_msm_fn(ops: CurveOps, mesh: Mesh, axis: str = "i"):
    """jitted (points, scalars) -> single point: per-shard scalar-mul +
    local tree reduction, then an all-gather of one partial point per shard
    and a final group-law reduction (replicated output)."""
    pspec = _point_spec(ops, axis)
    sspec = P(None, axis)

    def local(p, s):
        partial = ops.msm(PointVec(p), s)  # (L[,d], 1) per shard
        # gather one partial per shard onto every chip, reduce with the
        # group law (psum is invalid for curve points)
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True),
            dict(partial),
        )
        return dict(ops.sum_reduce(PointVec(gathered)))

    sm = shard_map(
        local,
        mesh=mesh,
        in_specs=({"x": pspec, "y": pspec, "z": pspec}, sspec),
        out_specs={"x": P(), "y": P(), "z": P()},
        check_vma=False,
    )
    return jax.jit(lambda p, s: PointVec(sm(dict(p), s)))


def sharded_step_fn(ops: CurveOps, mesh: Mesh, axis: str = "i"):
    """jitted (points, scalars) -> (points, msm_point): the full
    contribution step (elementwise batch_exp over the sharded i-range) AND
    verification's cross-chip RLC MSM reduction in ONE compiled module —
    the scalar-mul ladder (the bulk of the graph) is compiled once and
    feeds both outputs, halving multi-chip compile time vs two separate
    jits (sharded_batch_exp_fn + sharded_msm_fn)."""
    pspec = _point_spec(ops, axis)
    sspec = P(None, axis)

    def local(p, s):
        prods = ops.scalar_mul(PointVec(p), s)
        partial = ops.sum_reduce(prods)  # (L[,d], 1) per shard
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True),
            dict(partial),
        )
        total = ops.sum_reduce(PointVec(gathered))
        return dict(prods), dict(total)

    sm = shard_map(
        local,
        mesh=mesh,
        in_specs=({"x": pspec, "y": pspec, "z": pspec}, sspec),
        out_specs=(
            {"x": pspec, "y": pspec, "z": pspec},
            {"x": P(), "y": P(), "z": P()},
        ),
        check_vma=False,
    )

    def f(p, s):
        prods, total = sm(dict(p), s)
        return PointVec(prods), PointVec(total)

    return jax.jit(f)


def sharded_group_ifft_fn(curve_name: str, group: str, n: int, mesh: Mesh, axis: str = "i"):
    """jitted PointVec -> PointVec group-element IFFT with the point batch
    sharded over the mesh — the distributed prepare_phase2 NTT.

    The butterfly network is expressed as reshapes/slices over the batch
    axis (ntt/group_fft.py); annotating the input sharding lets XLA's GSPMD
    partitioner keep the early (shard-local) stages communication-free and
    insert collective-permutes only for the log2(n_devices) global stages —
    the all-to-all butterfly exchange of SURVEY §2.3 without hand-written
    collectives."""
    from ..ntt.group_fft import group_fft
    from ..ops.curve_jax import curve_ops

    ops = curve_ops(curve_name, group)
    gf = group_fft(curve_name, group, n)
    pspec = _point_spec(ops, axis)
    pshard = NamedSharding(mesh, pspec)
    shardings = PointVec(x=pshard, y=pshard, z=pshard)
    # twiddle/index tables ride as replicated ARGUMENTS (constant-baking
    # them breaks at production sizes — see GroupFFT._tables)
    repl = NamedSharding(mesh, P())
    jf = jax.jit(
        gf._traceable(), in_shardings=(shardings, repl), out_shardings=shardings
    )
    tables = jax.device_put(gf._tables(True)[:6], repl)
    return lambda p: jf(p, tables)
