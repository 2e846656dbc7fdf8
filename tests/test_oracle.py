"""Three-way cross-check: C++ limb oracle vs Python-int host field vs the
device limb kernels, on all five curves' base and scalar fields."""

import random

import numpy as np
import pytest

import oracle
from snark_setup_tpu.curves.constants import get_curve

CURVES = ["bls12_377", "bls12_381", "bw6_761", "mnt4_753", "mnt6_753"]


@pytest.mark.parametrize("curve", CURVES)
def test_oracle_matches_python_ints(curve):
    spec = get_curve(curve)
    rng = random.Random(curve)
    for modulus in (spec.q, spec.r):
        a = [rng.randrange(modulus) for _ in range(16)]
        b = [rng.randrange(modulus) for _ in range(16)]
        got = oracle.mod_mul(modulus, a, b)
        assert got == [x * y % modulus for x, y in zip(a, b)]
        e = [rng.randrange(1 << 64) for _ in range(4)]
        got_pow = oracle.mod_pow(modulus, a[:4], e)
        assert got_pow == [pow(x, k, modulus) for x, k in zip(a[:4], e)]


def test_oracle_matches_device_kernels():
    """Device Montgomery mul vs the oracle on random vectors (bls12_377 Fq)."""
    from snark_setup_tpu.fields.limb import ints_to_limbs_batch, limbs_batch_to_ints
    from snark_setup_tpu.ops.fp_jax import fp_ops

    spec = get_curve("bls12_377")
    fq = fp_ops(spec.q)
    rng = random.Random(99)
    a = [rng.randrange(spec.q) for _ in range(32)]
    b = [rng.randrange(spec.q) for _ in range(32)]
    import jax

    f = jax.jit(lambda x, y: fq.from_mont(fq.mont_mul(fq.to_mont_raw(x), fq.to_mont_raw(y))))
    a_raw = np.ascontiguousarray(ints_to_limbs_batch(a, fq.L).T)
    b_raw = np.ascontiguousarray(ints_to_limbs_batch(b, fq.L).T)
    got = limbs_batch_to_ints(np.asarray(f(a_raw, b_raw)).T)
    want = oracle.mod_mul(spec.q, a, b)
    assert list(got) == want
