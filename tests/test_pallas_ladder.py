"""Fused GLV ladder kernel (ops/pallas_ladder.py) validation on CPU.

Two tiers (the full 33-window kernel in interpret mode costs ~10 CPU-min to
compile on this box, far past the smoke budget):
1. the kernel-side field/group functions (_fmul/_fmul2/_fadd/_fsub/_fneg,
   _kadd/_kdbl) are pure jnp — called directly (no pallas) against the
   column-space FpOps path and the host curve;
2. the pallas wiring (BlockSpecs, scratch table, fori_loops over refs) runs
   in interpret mode with a TRUNCATED digit plane (2 windows): scalars whose
   GLV halves fit in 2^8 make the low windows carry the whole value, so the
   2-window kernel computes the exact product at ~1/16 the graph size.

On real TPU backends the full kernel engages automatically through
CurveOps.scalar_mul; bench.py measures it.
"""

import numpy as np
import pytest

from snark_setup_tpu.curves.host import g1_curve
from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.ops.pallas_ladder import (
    FusedGLVLadder,
    _fadd,
    _fmul,
    _fneg,
    _fsub,
    _kadd,
    _kdbl,
    _stack_mul2,
    fused_ladder_available,
)

CURVE = "bls12_377"


def _consts(ops, TB):
    L = ops.fq.L
    N_b = np.ascontiguousarray(np.broadcast_to(ops.fq.N, (L, TB))).astype(np.uint32)
    Np_b = np.ascontiguousarray(np.broadcast_to(ops.fq.Nprime, (L, TB))).astype(np.uint32)
    b3_b = np.ascontiguousarray(
        np.broadcast_to(np.asarray(ops.b3_dev).reshape(L, 1), (L, TB))
    ).astype(np.uint32)
    NS = np.concatenate([N_b] * 6, axis=-1)
    NpS = np.concatenate([Np_b] * 6, axis=-1)
    return N_b, Np_b, b3_b, NS, NpS


def test_kernel_field_ops_match_fp_ops():
    ops = curve_ops(CURVE, "g1")
    fq = ops.fq
    q = fq.modulus
    rng = np.random.default_rng(3)
    TB = 4
    a_i = [int(rng.integers(1, 1 << 62)) * 0 + int.from_bytes(rng.bytes(46), "little") % q for _ in range(TB)]
    b_i = [int.from_bytes(rng.bytes(46), "little") % q for _ in range(TB)]
    a_i[0] = 0  # zero rides every path
    a = fq.from_int(a_i)
    b = fq.from_int(b_i)
    N_b, Np_b, _, NS, NpS = _consts(ops, TB)

    assert fq.to_int(np.asarray(_fadd(a, b, N_b))) == [(x + y) % q for x, y in zip(a_i, b_i)]
    assert fq.to_int(np.asarray(_fsub(a, b, N_b))) == [(x - y) % q for x, y in zip(a_i, b_i)]
    assert fq.to_int(np.asarray(_fneg(a, N_b))) == [(-x) % q for x in a_i]
    assert fq.to_int(np.asarray(_fmul(a, b, N_b, Np_b))) == [x * y % q for x, y in zip(a_i, b_i)]
    (got2,) = _stack_mul2([(a, b, b, a)], NS, NpS, TB)
    assert fq.to_int(np.asarray(got2)) == [2 * x * y % q for x, y in zip(a_i, b_i)]


def test_kernel_group_law_matches_host():
    ops = curve_ops(CURVE, "g1")
    hc = g1_curve(ops.spec)
    rng = np.random.default_rng(4)
    TB = 4
    from snark_setup_tpu.curves.host import INFINITY

    P = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, TB)]
    Q = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, TB)]
    P[1] = INFINITY  # complete formulas: O + Q, P + P, 2O
    Q[2] = P[2]
    pv, qv = ops.from_affine_host(P), ops.from_affine_host(Q)
    N_b, Np_b, b3_b, NS, NpS = _consts(ops, TB)

    x, y, z = _kadd(
        (pv["x"], pv["y"], pv["z"]), (qv["x"], qv["y"], qv["z"]),
        N_b, Np_b, b3_b, NS, NpS, TB,
    )
    from snark_setup_tpu.ops.curve_jax import PointVec

    got = ops.to_affine_host(PointVec(x=x, y=y, z=z))
    assert got == [hc.add(p, q) for p, q in zip(P, Q)]

    x, y, z = _kdbl((pv["x"], pv["y"], pv["z"]), N_b, Np_b, b3_b, NS, NpS, TB)
    got = ops.to_affine_host(PointVec(x=x, y=y, z=z))
    assert got == [hc.add(p, p) for p in P]


@pytest.mark.slow
def test_fused_ladder_pallas_wiring_interpret():
    """2-window truncated kernel in interpret mode: exercises BlockSpecs,
    the scratch table build, digit selection, the endo branch and padding."""
    ops = curve_ops(CURVE, "g1")
    assert fused_ladder_available(ops)
    hc = ops.host_curve
    spec = ops.spec
    rng = np.random.default_rng(11)
    n = 5
    from snark_setup_tpu.curves.host import INFINITY

    base_pts = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 28, n)]
    base_pts[3] = INFINITY

    # scalars k = m1 + m2*lam with m1, m2 in [0, 2^8): the GLV decomposition
    # reproduces (m1, m2) (shortest representative), so only the last two
    # 4-bit windows are nonzero and the truncated plane carries everything
    lam = ops.glv.p.lam
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 8, (n, 2))]
    pairs[1] = (0, 0)
    ks = [(m1 + m2 * lam) % spec.r for m1, m2 in pairs]

    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    m1, neg1, m2, neg2 = ops.glv.decompose(sc)
    w = ops.WINDOW
    nbits = ops.glv.p.nbits
    d1 = np.asarray(ops.scalar_digits_msb(m1, w, nbits))
    d2 = np.asarray(ops.scalar_digits_msb(m2, w, nbits))
    # decomposition must have found the short (m1, m2) themselves
    assert not (np.asarray(neg1).any() or np.asarray(neg2).any())
    assert d1[:-2].max() == 0 and d2[:-2].max() == 0

    pts = ops.from_affine_host(base_pts)
    lad = FusedGLVLadder(ops)
    out = lad(
        pts, d1[-2:], d2[-2:], np.asarray(neg1), np.asarray(neg1 ^ neg2),
        interpret=True,
    )
    got = ops.to_affine_host(out)
    assert got == [hc.mul(p, k) for p, k in zip(base_pts, ks)]
