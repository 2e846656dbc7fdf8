"""Toeplitz-matmul Montgomery reduction (fp_jax.redc_cols_matmul) vs the
column-space reference path. On TPU the two dots ride the MXU; the math is
backend-independent (f32-exact: terms < 2^16, sums < 2^24), so CPU checks
full correctness here. This path is also the workaround for the XLA:TPU
fused-redc miscompile at batch >= 2^14 (see fp_jax docstring) — host-level
ground truth below, not just cross-path agreement."""

import random

import numpy as np
import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.ops.fp_jax import fp_ops


@pytest.mark.parametrize("curve", ["bls12_377", "bw6_761"])
def test_redc_matmul_matches_reference_and_host(curve):
    spec = get_curve(curve)
    fq = fp_ops(spec.q)
    q = spec.q
    rng = random.Random(5)
    B = 37
    a_i = [rng.randrange(q) for _ in range(B)]
    b_i = [rng.randrange(q) for _ in range(B)]
    a_i[0] = 0
    a = fq.from_int(a_i)
    b = fq.from_int(b_i)
    cols = fq.school_cols(a, b)
    ref = np.asarray(fq.redc_cols(cols))
    got = np.asarray(fq.redc_cols_matmul(cols))
    assert (ref == got).all()
    # ground truth
    assert fq.to_int(got) == [x * y % q for x, y in zip(a_i, b_i)]


def test_redc_matmul_weighted_stacked():
    """Accumulated weighted columns (the mul_stacked shape) reduce the same
    way through both paths, including the nprod > 1 bound."""
    spec = get_curve("bls12_377")
    fq = fp_ops(spec.q)
    q = spec.q
    rng = random.Random(6)
    S, B = 3, 9
    a = [[rng.randrange(q) for _ in range(B)] for _ in range(S)]
    b = [[rng.randrange(q) for _ in range(B)] for _ in range(S)]
    U = np.stack([fq.from_int(r) for r in a], axis=1)
    V = np.stack([fq.from_int(r) for r in b], axis=1)
    W = np.asarray(fq.school_cols(U, V))  # (2L, S, B)
    acc = W[:, 0] + np.uint32(2) * W[:, 1] + W[:, 2]
    ref = np.asarray(fq.redc_cols(acc, nprod=4))
    got = np.asarray(fq.redc_cols_matmul(acc, nprod=4))
    assert (ref == got).all()
    want = [
        (a[0][k] * b[0][k] + 2 * a[1][k] * b[1][k] + a[2][k] * b[2][k]) % q
        for k in range(B)
    ]
    assert fq.to_int(got) == want


def test_mul_stacked_mxu_route_matches(monkeypatch):
    """Force the TPU routing (pallas interpret + MXU redc) on CPU and
    compare against the pure jnp column path, base and ext fields."""
    monkeypatch.setenv("SNARK_SETUP_MXU_REDC", "1")
    from snark_setup_tpu.ops.curve_jax import curve_ops
    from snark_setup_tpu.ops.pallas_field import pallas_mul_for

    ops = curve_ops("bls12_377", "g1")
    fq = ops.fq
    q = ops.spec.q
    rng = random.Random(7)
    S, B = 2, 5
    a = [[rng.randrange(q) for _ in range(B)] for _ in range(S)]
    b = [[rng.randrange(q) for _ in range(B)] for _ in range(S)]
    U = np.stack([fq.from_int(r) for r in a], axis=1)
    V = np.stack([fq.from_int(r) for r in b], axis=1)
    weights = ((1, 1), (0, 1))
    pm = pallas_mul_for(q)
    cols = pm.cols(U, V, weights, interpret=True)
    got = np.asarray(fq.redc_cols_matmul(cols, 2))
    want0 = [(a[0][k] * b[0][k] + a[1][k] * b[1][k]) % q for k in range(B)]
    want1 = [a[1][k] * b[1][k] % q for k in range(B)]
    assert fq.to_int(got[:, 0]) == want0
    assert fq.to_int(got[:, 1]) == want1
