"""Device field arithmetic vs python-int oracle.

Mirrors the reference's inline field sanity coverage; the oracle is exact
host bigint math (reference relies on arkworks ark-ff correctness)."""

import random

import jax
import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.ops.fp_jax import fp_ops

CURVE = "bls12_377"


@pytest.fixture(scope="module")
def fp():
    return fp_ops(get_curve(CURVE).q)


def _rand_vals(fp, n, seed=1):
    rng = random.Random(seed)
    return [rng.randrange(fp.modulus) for _ in range(n)]


def test_mont_roundtrip(fp):
    vals = _rand_vals(fp, 8)
    assert fp.to_int(fp.from_int(vals)) == vals


def test_mul_add_sub_neg(fp):
    q = fp.modulus
    va, vb = _rand_vals(fp, 8, 1), _rand_vals(fp, 8, 2)
    a, b = fp.from_int(va), fp.from_int(vb)
    assert fp.to_int(jax.jit(fp.mont_mul)(a, b)) == [x * y % q for x, y in zip(va, vb)]
    assert fp.to_int(jax.jit(fp.add)(a, b)) == [(x + y) % q for x, y in zip(va, vb)]
    assert fp.to_int(jax.jit(fp.sub)(a, b)) == [(x - y) % q for x, y in zip(va, vb)]
    assert fp.to_int(jax.jit(fp.neg)(a)) == [(-x) % q for x in va]


def test_edge_values(fp):
    q = fp.modulus
    va = [0, 1, q - 1, q - 2, 2, 0, 1, q - 1]
    vb = [q - 1, q - 1, q - 1, 1, 2, 0, 0, 1]
    a, b = fp.from_int(va), fp.from_int(vb)
    assert fp.to_int(jax.jit(fp.mont_mul)(a, b)) == [x * y % q for x, y in zip(va, vb)]
    assert fp.to_int(jax.jit(fp.add)(a, b)) == [(x + y) % q for x, y in zip(va, vb)]
    assert fp.to_int(jax.jit(fp.sub)(a, b)) == [(x - y) % q for x, y in zip(va, vb)]


def test_inv(fp):
    q = fp.modulus
    va = _rand_vals(fp, 4, 3)
    assert fp.to_int(jax.jit(fp.inv)(fp.from_int(va))) == [pow(x, -1, q) for x in va]


def test_batch_inv_with_zeros(fp):
    q = fp.modulus
    va = [5, 0, 7, 11]
    out = fp.to_int(jax.jit(fp.batch_inv)(fp.from_int(va)))
    assert out == [pow(5, -1, q), 0, pow(7, -1, q), pow(11, -1, q)]
