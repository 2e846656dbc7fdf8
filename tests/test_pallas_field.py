"""Pallas stacked-Montgomery kernel vs the jnp column-space path (interpret
mode on CPU; the compiled kernel runs on real TPU backends)."""

import random

import numpy as np
import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.ops.fp_jax import fp_ops
from snark_setup_tpu.ops.pallas_field import pallas_mul_for


@pytest.mark.parametrize("curve", ["bls12_377", "bw6_761"])
def test_pallas_mul_stacked_matches_jnp(curve):
    spec = get_curve(curve)
    fq = fp_ops(spec.q)
    rng = random.Random(31)
    S, B = 6, 40  # B deliberately not a multiple of the 256 tile
    a_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    b_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    U = np.stack([fq.from_int(row) for row in a_ints], axis=1)  # (L, S, B)
    V = np.stack([fq.from_int(row) for row in b_ints], axis=1)

    weights = ((1, 1, 0, 0, 0, 0), (0, 0, 1, 1, 0, 0), (0, 0, 0, 0, 2, 1))
    out = pallas_mul_for(spec.q)(U, V, weights, interpret=True)

    # redc(sum w * (aR)(bR)) = (sum w*a*b)*R = Montgomery form of the sum,
    # and to_int strips the R factor
    for g, g_w in enumerate(weights):
        got = fq.to_int(np.asarray(out[:, g]))
        expect = [
            sum(w * a_ints[s][k] * b_ints[s][k] for s, w in enumerate(g_w)) % spec.q
            for k in range(B)
        ]
        assert got == expect


@pytest.mark.parametrize("curve", ["bls12_377", "mnt4_753"])
def test_pallas_ext_mul_stacked_matches_jnp(curve):
    """The composite (curve ⊗ tower) flattening for ext fields, interpret
    mode, vs the jnp prod_cols/redc path."""
    import jax.numpy as jnp

    from snark_setup_tpu.ops.curve_jax import curve_ops
    from snark_setup_tpu.ops import pallas_field

    ops = curve_ops(curve, "g2")
    F = ops.field
    rng = random.Random(7)
    d, S, B = F.degree, 3, 5
    spec = ops.spec

    def rand_el():
        return tuple(rng.randrange(spec.q) for _ in range(d))

    U = F.from_coeffs([rand_el() for _ in range(S * B)]).reshape(F.fp.L, d, S, B)
    V = F.from_coeffs([rand_el() for _ in range(S * B)]).reshape(F.fp.L, d, S, B)
    weights = ((1, 1, 0), (0, 0, 1))

    want = np.asarray(F.mul_stacked(U, V, weights, 3 * F.prod_nprod))

    orig_call = pallas_field.PallasFieldMul.__call__

    def interp_call(self, u, v, w, interpret=False):
        return orig_call(self, u, v, w, interpret=True)

    pallas_field.PallasFieldMul.__call__ = interp_call
    orig_enabled = pallas_field.pallas_enabled
    pallas_field.pallas_enabled = lambda: True
    try:
        got = np.asarray(F.mul_stacked(U, V, weights, 3 * F.prod_nprod))
    finally:
        pallas_field.PallasFieldMul.__call__ = orig_call
        pallas_field.pallas_enabled = orig_enabled
    assert np.array_equal(got, want)


def test_pallas_group_law_interpret():
    """Full RCB add through the pallas path (interpret mode) vs host."""
    import os

    os.environ["SNARK_SETUP_PALLAS"] = "0"  # keep module-level default off
    from snark_setup_tpu.ops import pallas_field
    from snark_setup_tpu.ops.curve_jax import curve_ops

    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    pts_h = [hc.mul(hc.generator, 3 + i) for i in range(4)]
    q_h = [hc.mul(hc.generator, 100 + i) for i in range(4)]
    F = ops.field

    orig = F.mul_stacked
    pm = pallas_mul_for(ops.spec.q)

    def patched(U, V, weights, nprod):
        if U.ndim == 3:
            return pm(U, V, weights, interpret=True)
        return orig(U, V, weights, nprod)

    F.mul_stacked = patched
    try:
        s = ops.to_affine_host(ops.add(ops.from_affine_host(pts_h), ops.from_affine_host(q_h)))
        d = ops.to_affine_host(ops.double(ops.from_affine_host(pts_h)))
    finally:
        F.mul_stacked = orig
    assert s == [hc.add(a, b) for a, b in zip(pts_h, q_h)]
    assert d == [hc.add(a, a) for a in pts_h]


@pytest.mark.parametrize("curve", ["bls12_377", "bw6_761"])
def test_pallas_v2_fused_matches_host(curve):
    """v2 fused kernel (f32 byte-plane schoolbook + in-kernel MXU Toeplitz
    REDC) vs host integer math, interpret mode."""
    spec = get_curve(curve)
    fq = fp_ops(spec.q)
    rng = random.Random(97)
    S, B = 6, 40
    a_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    b_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    U = np.stack([fq.from_int(row) for row in a_ints], axis=1)
    V = np.stack([fq.from_int(row) for row in b_ints], axis=1)

    # sum(w) <= 2 everywhere for L=48 f32 exactness; the 2-weight row
    # exercises weighted accumulation on the smaller curve
    if fq.L <= 24:
        weights = ((1, 1, 0, 0, 0, 0), (0, 0, 1, 1, 0, 0), (0, 0, 0, 0, 2, 1))
    else:
        weights = ((1, 1, 0, 0, 0, 0), (0, 0, 1, 1, 0, 0), (0, 0, 0, 0, 1, 1))
    pm = pallas_mul_for(spec.q)
    assert pm.v2_supported(weights)
    out = pm.v2(U, V, weights, interpret=True)

    for g, g_w in enumerate(weights):
        got = fq.to_int(np.asarray(out[:, g]))
        expect = [
            sum(w * a_ints[s][k] * b_ints[s][k] for s, w in enumerate(g_w)) % spec.q
            for k in range(B)
        ]
        assert got == expect


def test_pallas_v2_bounds_gate():
    """Weight sums beyond the f32 exactness bound must be rejected."""
    from snark_setup_tpu.ops.pallas_field import v2_bounds

    ok24, fused24 = v2_bounds(24, ((1, 1),))
    assert ok24 and fused24
    ok48, fused48 = v2_bounds(48, ((1, 1),))
    assert ok48 and not fused48
    assert not v2_bounds(48, ((3, 3),))[0]


@pytest.mark.parametrize("curve", ["bls12_377", "bw6_761"])
def test_pallas_v3_hybrid_matches_host(curve):
    """v3 hybrid kernel (u32 schoolbook + in-kernel MXU Toeplitz REDC) vs
    host integer math, interpret mode."""
    spec = get_curve(curve)
    fq = fp_ops(spec.q)
    rng = random.Random(55)
    S, B = 4, 33
    a_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    b_ints = [[rng.randrange(spec.q) for _ in range(B)] for _ in range(S)]
    U = np.stack([fq.from_int(row) for row in a_ints], axis=1)
    V = np.stack([fq.from_int(row) for row in b_ints], axis=1)
    weights = ((1, 1, 0, 0), (0, 0, 2, 1))
    out = pallas_mul_for(spec.q).v3(U, V, weights, interpret=True)
    for g, g_w in enumerate(weights):
        got = fq.to_int(np.asarray(out[:, g]))
        expect = [
            sum(w * a_ints[s][k] * b_ints[s][k] for s, w in enumerate(g_w)) % spec.q
            for k in range(B)
        ]
        assert got == expect
