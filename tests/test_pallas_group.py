"""Fused group-op pallas kernels (ops/pallas_group.py) vs the stacked-round
group law — interpret mode on CPU, exact affine comparison, including the
complete-formula edge cases (infinity, P+P, P+(-P))."""

import numpy as np

from snark_setup_tpu.curves.host import INFINITY
from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.ops.pallas_group import group_ops_for


def _affine(ops, pv):
    return ops.to_affine_host(pv)


def test_fused_double_matches_stacked():
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(3)
    pts = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 6)]
    pts.append(INFINITY)
    pts.append(hc.generator)
    P = ops.from_affine_host(pts)
    g = group_ops_for("bls12_377", "g1")
    want = _affine(ops, ops.double(P))
    got = _affine(ops, g.double(P, interpret=True))
    assert want == got


def test_fused_add_matches_stacked():
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(4)
    a = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)]
    b = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)]
    # edge cases: O+Q, P+O, P+P (doubling), P+(-P) (inverse)
    a += [INFINITY, a[0], a[1], a[2]]
    b += [b[0], INFINITY, a[1], hc.neg(a[2])]
    P = ops.from_affine_host(a)
    Q = ops.from_affine_host(b)
    g = group_ops_for("bls12_377", "g1")
    want = _affine(ops, ops.add(P, Q))
    got = _affine(ops, g.add(P, Q, interpret=True))
    assert want == got


def test_fused_double_b3s_variants():
    """The small-3b doubling has three in-kernel shapes: weight fold with
    raw_ok (BLS12-377, w=3), modular _fadd-chain prescale (BLS12-381, w=12
    with 12N >= R), and negate (BW6-761, 3b = -3). Each must match the
    stacked path (which has its own host-oracle tests)."""
    from snark_setup_tpu.ops.pallas_ladder import _b3s_for

    for curve, group in (("bls12_381", "g1"), ("bw6_761", "g1"), ("bw6_761", "g2")):
        ops = curve_ops(curve, group)
        b3s = _b3s_for(ops)  # may be None (generic in-kernel 3b mul)
        hc = ops.host_curve
        rng = np.random.default_rng(11)
        pts = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 2)]
        pts.append(INFINITY)
        P = ops.from_affine_host(pts)
        g = group_ops_for(curve, group)
        want = _affine(ops, ops.double(P))
        got = _affine(ops, g.double(P, interpret=True))
        assert want == got, (curve, group, b3s)
        # fused add exercises the small-3b _fadd-chain round (or the
        # generic product round when b3s is None)
        Q = ops.from_affine_host(list(reversed(pts)))
        want_a = _affine(ops, ops.add(P, Q))
        got_a = _affine(ops, g.add(P, Q, interpret=True))
        assert want_a == got_a, (curve, group, b3s)
