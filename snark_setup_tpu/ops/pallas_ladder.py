"""Fused GLV windowed-ladder Pallas kernel: one kernel per batch tile runs
the ENTIRE scalar multiplication with every intermediate in VMEM.

Why (measured, BASELINE.md roofline): the stacked-Montgomery kernel
(pallas_field.py) fuses one multiplication ROUND, but a group add is 3 such
rounds plus ~20 XLA elementwise glue ops, and the GLV ladder is ~33 windows
x (4 doubles + 2 adds) — every boundary streams (L, S, B) uint32 planes
through HBM. At batch 16k that is tens of GB of HBM traffic per ladder and
thousands of kernel launches, which is where the missing 5.7x to
speed-of-light lives. This kernel keeps the accumulator, the 16-entry
window table and all group-law temporaries in VMEM for the whole ladder:
HBM is touched once for the input points/digits and once for the result.

Scope: degree-1 coordinate fields with the cube-root endomorphism — G1 of
BLS12-377/381 and BOTH groups of BW6-761 (its G2 is also over Fq with
a=0). BLS12 G2 (Fp2) and the MNT curves keep the stacked-round path.

Structure per tile (mirrors CurveOps._scalar_mul_glv exactly):
  base = (-1)^neg1 * P
  table[j] = j * base, j in [0, 16)  (built with a fori_loop of adds)
  acc = O
  for k in 0..nwin-1:   (fori_loop; digits are MSB-first w=4 windows)
      acc = 16 * acc    (4 dedicated a=0 RCB doublings)
      acc += table[d1[k]]               (one-hot select, complete add)
      acc += endo(table[d2[k]])         (coefficient-wise beta mul; y
                                         negated where neg1 != neg2)
The group law is the same complete RCB a=0 system as curve_jax.py
(eprint 2015/1060 Alg. 7/9) with pairwise-merged REDCs (two products share
one reduction — valid while 2N < R, which holds for every supported
modulus).

Replaces the hot loop of batch_exp (reference setup-utils/src/
helpers.rs:75-140) on the TPU compute path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_field import (
    MASK,
    SHIFT,
    _redc_kernel,
    _resolve_carries_kernel,
    _school_cols_accum,
    _sub_with_borrow_kernel,
)

WINDOW = 4
TABLE = 1 << WINDOW


# -- kernel-side degree-1 field helpers ((L, TB) uint32 values) -------------


def _fadd(a, b, N_b):
    s = _resolve_carries_kernel(a + b)  # a + b < 2N < R: no lost top carry
    d, no_borrow = _sub_with_borrow_kernel(s, N_b)
    return jnp.where(no_borrow > 0, d, s)


def _fsub(a, b, N_b):
    d, no_borrow = _sub_with_borrow_kernel(a, b)
    dn = _resolve_carries_kernel(d + N_b)
    return jnp.where(no_borrow > 0, d, dn)


def _fneg(a, N_b):
    """N - a, with 0 -> 0. All intermediates stay 2-D (Mosaic-safe).
    The zero test is one sublane max-reduction instead of an L-deep
    serial OR chain (limbs are < 2^16, so max==0 iff all zero)."""
    nz = jnp.max(a.astype(jnp.int32), axis=0, keepdims=True)  # Mosaic
    # cannot reduce unsigned ints; limbs < 2^16 are exact in i32
    d, _ = _sub_with_borrow_kernel(N_b, a)  # exact: a < N
    return jnp.where(nz == 0, a, d)


def _fmul(a, b, N_b, Np_b):
    L = N_b.shape[0]
    acc = jnp.zeros((2 * L, a.shape[-1]), jnp.uint32)
    acc = _school_cols_accum(a, b, acc, 1)
    return _redc_kernel(acc, N_b[:, : a.shape[-1]], Np_b[:, : a.shape[-1]])


def _split(v, S, TB):
    return [v[:, i * TB : (i + 1) * TB] for i in range(S)]


def _stack_mul(pairs, NS, NpS, TB):
    """Independent products lane-CONCATENATED into one schoolbook + one
    REDC: out[i] = a_i * b_i. This is the kernel's throughput backbone —
    a single (L, TB) op is only L*TB/1024 vregs deep in a serial
    dependency chain, so stacking S independent products widens every op
    S-fold and keeps the VPU pipeline fed (measured 5x on v5e vs the
    per-product version of this same kernel)."""
    S = len(pairs)
    A = jnp.concatenate([a for a, _ in pairs], axis=-1)
    B = jnp.concatenate([b for _, b in pairs], axis=-1)
    L = NS.shape[0]
    acc = jnp.zeros((2 * L, S * TB), jnp.uint32)
    acc = _school_cols_accum(A, B, acc, 1)
    out = _redc_kernel(acc, NS[:, : S * TB], NpS[:, : S * TB])
    return _split(out, S, TB)


def _stack_mul2(quads, NS, NpS, TB):
    """out[i] = redc(a1_i*b1_i + a2_i*b2_i): 2S products, S reductions."""
    S = len(quads)
    A1 = jnp.concatenate([q[0] for q in quads], axis=-1)
    B1 = jnp.concatenate([q[1] for q in quads], axis=-1)
    A2 = jnp.concatenate([q[2] for q in quads], axis=-1)
    B2 = jnp.concatenate([q[3] for q in quads], axis=-1)
    L = NS.shape[0]
    acc = jnp.zeros((2 * L, S * TB), jnp.uint32)
    acc = _school_cols_accum(A1, B1, acc, 1)
    acc = _school_cols_accum(A2, B2, acc, 1)
    out = _redc_kernel(acc, NS[:, : S * TB], NpS[:, : S * TB])
    return _split(out, S, TB)


def _stack_add(pairs, NS, TB):
    S = len(pairs)
    A = jnp.concatenate([a for a, _ in pairs], axis=-1)
    B = jnp.concatenate([b for _, b in pairs], axis=-1)
    return _split(_fadd(A, B, NS[:, : S * TB]), S, TB)


def _stack_sub(pairs, NS, TB):
    S = len(pairs)
    A = jnp.concatenate([a for a, _ in pairs], axis=-1)
    B = jnp.concatenate([b for _, b in pairs], axis=-1)
    return _split(_fsub(A, B, NS[:, : S * TB]), S, TB)


# -- kernel-side a=0 complete group law (coords = 3-tuples of (L, TB)) ------
# Every multiplication round runs lane-stacked (see _stack_mul); the
# formulas are the same RCB Alg. 7/9 systems as curve_jax.CurveOps.


def _kadd(p, q, N_b, Np_b, b3_b, NS, NpS, TB, b3s=None):
    """RCB complete add, a=0 (Alg. 7): 14 products, 9 reductions, stacked
    6 + 2 + 3 lanes wide. With small |3b| (`b3s`), the 3b*t2 / 3b*t4 round
    collapses into modular _fadd chains (2 adds each at w=3) — 12
    products / 8 reductions and one round fewer."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    sXY1, sXZ1, sYZ1, sXY2, sXZ2, sYZ2 = _stack_add(
        [(X1, Y1), (X1, Z1), (Y1, Z1), (X2, Y2), (X2, Z2), (Y2, Z2)], NS, TB
    )
    t0, t1, t2, s3, s4, s5 = _stack_mul(
        [(X1, X2), (Y1, Y2), (Z1, Z2), (sXY1, sXY2), (sXZ1, sXZ2), (sYZ1, sYZ2)],
        NS, NpS, TB,
    )
    a01, a02, a12 = _stack_add([(t0, t1), (t0, t2), (t1, t2)], NS, TB)
    t3, t4, t5 = _stack_sub([(s3, a01), (s4, a02), (s5, a12)], NS, TB)
    if b3s is not None:
        w, negate, _raw_ok = b3s
        # modular small-mult chains (stacked 2 wide); raw accumulation is
        # NOT used here because these values feed subs and round-2
        # products whose bounds assume canonical (< N) operands
        pair = jnp.concatenate([t2, t4], axis=-1)
        acc = None
        addend = pair
        k = w
        N2 = NS[:, : 2 * TB]
        while k:
            if k & 1:
                acc = addend if acc is None else _fadd(acc, addend, N2)
            k >>= 1
            if k:
                addend = _fadd(addend, addend, N2)
        if negate:
            acc = _fneg(acc, N2)
        Z3_, t4b = _split(acc, 2, TB)
    else:
        Z3_, t4b = _stack_mul([(b3_b, t2), (b3_b, t4)], NS, NpS, TB)
    t1n = _fadd(_fadd(t0, t0, N_b), t0, N_b)  # 3 X1X2
    X3_ = _fsub(t1, Z3_, N_b)
    Z3p = _fadd(t1, Z3_, N_b)
    y, x, z = _stack_mul2(
        [
            (X3_, Z3p, t1n, t4b),
            (t3, X3_, _fneg(t5, N_b), t4b),
            (t5, Z3p, t3, t1n),
        ],
        NS, NpS, TB,
    )
    return x, y, z


def _small_mul(a, w: int, N_b, raw_ok: bool):
    """w*a for a small host int w. When `raw_ok` (w*N < R, so the REDC of
    the consuming product absorbs the unreduced value) this is one u32
    lane-multiply + carry resolve; otherwise a modular _fadd chain."""
    if w == 1:
        return a
    if raw_ok:
        return _resolve_carries_kernel(a * np.uint32(w))
    result = None
    addend = a
    k = w
    while k:
        if k & 1:
            result = addend if result is None else _fadd(result, addend, N_b)
        k >>= 1
        if k:
            addend = _fadd(addend, addend, N_b)
    return result


def _kdbl(p, N_b, Np_b, b3_b, NS, NpS, TB, b3s=None):
    """Dedicated RCB a=0 doubling (Alg. 9): 9 products/reductions, stacked
    4 + 1 + 4 lanes wide. With `b3s` = (|3b|, negate, raw_ok) (the small-b3
    curves: G1 of BLS12-377/381, both BW6 groups), c = 3b*Z^2 folds into
    round 0 as (Z, |3b|*Z) — 8 products/reductions in 2 rounds."""
    X, Y, Z = p
    if b3s is not None:
        w, negate, raw_ok = b3s
        wZ = _small_mul(Z, w, N_b, raw_ok)
        t0, t1, m3, c = _stack_mul(
            [(Y, Y), (Y, Z), (X, Y), (Z, wZ)], NS, NpS, TB
        )
        if negate:
            c = _fneg(c, N_b)
    else:
        t0, t1, m3, t2 = _stack_mul(
            [(Y, Y), (Y, Z), (X, Y), (Z, Z)], NS, NpS, TB
        )
        c = _fmul(b3_b, t2, N_b, Np_b)
    z3a = _fadd(t0, t0, N_b)
    z3a = _fadd(z3a, z3a, N_b)
    z3a = _fadd(z3a, z3a, N_b)  # 8 Y^2
    c3 = _fadd(_fadd(c, c, N_b), c, N_b)
    t0p = _fsub(t0, c3, N_b)
    y3sum = _fadd(t0, c, N_b)
    x3, z3, y3a, x3b = _stack_mul(
        [(c, z3a), (t1, z3a), (t0p, y3sum), (t0p, m3)], NS, NpS, TB
    )
    return _fadd(x3b, x3b, N_b), _fadd(x3, y3a, N_b), z3


def _make_ladder_kernel(L: int, nwin: int, b3s=None):
    from jax.experimental import pallas as pl

    def kernel(
        x_ref, y_ref, z_ref, d1_ref, d2_ref, neg_ref, flip_ref,
        n_ref, np_ref, b3_ref, one_ref,
        beta_ref, ox_ref, oy_ref, oz_ref, tx_ref, ty_ref, tz_ref, t2x_ref,
    ):
        TB = x_ref.shape[-1]
        # constants arrive pre-materialized at (L, TB): Mosaic cannot lower
        # row-slices of an (L, 1)->(L, TB) lane-broadcast ("Broadcast in
        # both sublanes and lanes"), and _school_cols_accum slices rows
        N_b = n_ref[:]
        Np_b = np_ref[:]
        b3_b = b3_ref[:]
        one_b = one_ref[:]
        beta_b = beta_ref[:]
        zero_b = jnp.zeros((L, TB), jnp.uint32)
        # wide modulus rows for the lane-stacked rounds (max stack = 6)
        NS = jnp.concatenate([N_b] * 6, axis=-1)
        NpS = jnp.concatenate([Np_b] * 6, axis=-1)
        neg = neg_ref[:]  # (1, TB) uint32
        flip = flip_ref[:]

        def kadd(p, q):
            return _kadd(p, q, N_b, Np_b, b3_b, NS, NpS, TB, b3s)

        def kdbl(p):
            return _kdbl(p, N_b, Np_b, b3_b, NS, NpS, TB, b3s)

        # base = (-1)^neg1 * P
        bx = x_ref[:]
        by0 = y_ref[:]
        by = jnp.where(neg > 0, _fneg(by0, N_b), by0)
        bz = z_ref[:]

        # table[j] = j * base
        tx_ref[0], ty_ref[0], tz_ref[0] = zero_b, one_b, zero_b
        tx_ref[1], ty_ref[1], tz_ref[1] = bx, by, bz
        d2x, d2y, d2z = kdbl((bx, by, bz))
        tx_ref[2], ty_ref[2], tz_ref[2] = d2x, d2y, d2z

        def tbody(j, _):
            px = tx_ref[pl.ds(j - 1, 1)][0]
            py = ty_ref[pl.ds(j - 1, 1)][0]
            pz = tz_ref[pl.ds(j - 1, 1)][0]
            nx, ny, nz = kadd((px, py, pz), (bx, by, bz))
            tx_ref[pl.ds(j, 1)] = nx[None]
            ty_ref[pl.ds(j, 1)] = ny[None]
            tz_ref[pl.ds(j, 1)] = nz[None]
            return 0

        jax.lax.fori_loop(3, TABLE, tbody, 0)

        # endo table: t2x[j] = beta * tx[j], materialized ONCE with 4-wide
        # lane-stacked products (static j — Mosaic-friendly scratch writes)
        # instead of one narrow singleton _fmul per window (~2x the mults,
        # each poorly pipelined at stack width 1)
        t2x_ref[0] = zero_b
        for j0 in range(1, TABLE, 4):
            js = [j for j in range(j0, min(j0 + 4, TABLE))]
            outs = _stack_mul(
                [(tx_ref[j], beta_b) for j in js], NS, NpS, TB
            )
            for j, o in zip(js, outs):
                t2x_ref[j] = o

        def select(d, xref):
            # d: (1, TB); one-hot accumulate over the 16 static table rows
            sx, sy, sz = zero_b, one_b, zero_b
            for j in range(1, TABLE):
                m = d == np.uint32(j)
                sx = jnp.where(m, xref[j], sx)
                sy = jnp.where(m, ty_ref[j], sy)
                sz = jnp.where(m, tz_ref[j], sz)
            return sx, sy, sz

        def wbody(k, acc):
            acc = jax.lax.fori_loop(0, WINDOW, lambda _, a: kdbl(a), acc)
            s1 = select(d1_ref[pl.ds(k, 1)], tx_ref)
            acc = kadd(acc, s1)
            s2x, s2y, s2z = select(d2_ref[pl.ds(k, 1)], t2x_ref)
            s2y = jnp.where(flip > 0, _fneg(s2y, N_b), s2y)
            acc = kadd(acc, (s2x, s2y, s2z))
            return acc

        ax, ay, az = jax.lax.fori_loop(0, nwin, wbody, (zero_b, one_b, zero_b))
        ox_ref[:] = ax
        oy_ref[:] = ay
        oz_ref[:] = az

    return kernel


def _b3s_for(ops):
    """(|3b|, negate, raw_ok) for small-b3 curves, else None (see _kdbl)."""
    if getattr(ops, "_b3_small", None) is None:
        return None
    w, negate = ops._b3_small
    return (w, negate, w * ops.spec.q < ops.fq.spec.mont_r_pow)


class FusedGLVLadder:
    """Compiled fused ladder for one (CurveOps, tile) signature."""

    TILE_B = 128
    """Measured on v5e (2026-08-22, bench.py at batch 16k): TB=128 runs the
    whole-ladder kernel at 78-81k exp/s vs 32.5k at TB=256 — the 6-wide
    lane-stacked rounds of _kadd spill beyond the vreg budget at 1536
    lanes. At 128 the fused ladder also beats the multi-kernel group-op
    path (72-75k) in every paired A/B, so it is the TPU default (see
    fused_ladder_enabled)."""

    def __init__(self, ops):
        assert ops.field.degree == 1 and ops.glv is not None and ops.a_is_zero
        self.ops = ops
        fq = ops.fq
        self.L = fq.L
        self.N_col = np.asarray(fq.N, np.uint32)  # (L, 1)
        self.Np_col = np.asarray(fq.Nprime, np.uint32)
        self.b3_col = np.asarray(ops.b3_dev, np.uint32).reshape(self.L, 1)
        self.one_col = np.asarray(fq.one_mont_np, np.uint32)
        self.beta_col = np.asarray(ops._glv_beta, np.uint32).reshape(self.L, 1)
        self.b3s = _b3s_for(ops)
        self._cache = {}

    def _call_for(self, nwin: int, Bp: int, TB: int, interpret: bool):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L
        key = (nwin, Bp, TB, interpret)
        if key not in self._cache:
            kernel = _make_ladder_kernel(L, nwin, self.b3s)
            coord = pl.BlockSpec((L, TB), lambda i: (0, i))
            digit = pl.BlockSpec((nwin, TB), lambda i: (0, i))
            mask = pl.BlockSpec((1, TB), lambda i: (0, i))
            const = pl.BlockSpec((L, TB), lambda i: (0, 0))
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((L, Bp), jnp.uint32) for _ in range(3)
                ),
                grid=(Bp // TB,),
                in_specs=[coord] * 3 + [digit] * 2 + [mask] * 2 + [const] * 5,
                out_specs=(coord, coord, coord),
                scratch_shapes=[
                    pltpu.VMEM((TABLE, L, TB), jnp.uint32) for _ in range(4)
                ],
                interpret=interpret,
            )
        return self._cache[key]

    def __call__(self, pts, d1, d2, neg1, flip, interpret: bool = False):
        """pts: PointVec with (L, B) coords; d1/d2: (nwin, B) MSB-first w=4
        digit planes; neg1/flip: (B,) masks. Returns PointVec (L, B)."""
        from .curve_jax import PointVec

        B = pts["x"].shape[-1]
        nwin = d1.shape[0]
        tile = int(os.environ.get("SNARK_SETUP_LADDER_TILE_B", str(self.TILE_B)))
        TB = min(tile, max(128, B))
        Bp = -(-B // TB) * TB
        x, y, z = pts["x"], pts["y"], pts["z"]
        if Bp != B:
            pad = Bp - B
            x = jnp.pad(x, [(0, 0), (0, pad)])
            y = jnp.concatenate(
                [y, jnp.broadcast_to(self.one_col, (self.L, pad))], axis=-1
            )
            z = jnp.pad(z, [(0, 0), (0, pad)])
            d1 = jnp.pad(d1, [(0, 0), (0, pad)])
            d2 = jnp.pad(d2, [(0, 0), (0, pad)])
            neg1 = jnp.pad(neg1.reshape(-1), [(0, pad)])
            flip = jnp.pad(flip.reshape(-1), [(0, pad)])
        call = self._call_for(nwin, Bp, TB, interpret)

        def tile(c):
            return np.ascontiguousarray(np.broadcast_to(c, (self.L, TB)))

        ox, oy, oz = call(
            x, y, z,
            d1.astype(jnp.uint32), d2.astype(jnp.uint32),
            neg1.astype(jnp.uint32).reshape(1, -1),
            flip.astype(jnp.uint32).reshape(1, -1),
            tile(self.N_col), tile(self.Np_col), tile(self.b3_col),
            tile(self.one_col), tile(self.beta_col),
        )
        if Bp != B:
            ox, oy, oz = ox[:, :B], oy[:, :B], oz[:, :B]
        return PointVec(x=ox, y=oy, z=oz)


@functools.lru_cache(maxsize=None)
def fused_ladder_for(curve_name: str, group: str) -> FusedGLVLadder:
    from .curve_jax import curve_ops

    return FusedGLVLadder(curve_ops(curve_name, group))


def fused_ladder_available(ops) -> bool:
    return ops.field.degree == 1 and ops.glv is not None and ops.a_is_zero
