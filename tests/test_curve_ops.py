"""Device group law vs the host bigint curve oracle (BLS12-377 by default;
the all-curve sweep is marked slow — run with `-m slow`)."""

import random

import jax
import numpy as np
import pytest

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops

ALL_CURVES = ["bls12_377", "bls12_381", "bw6_761", "mnt4_753", "mnt6_753"]


def _scalars(ks, ops):
    return np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)


def _check_group(curve, grp, n=3, seed=7, with_smul=True):
    rng = random.Random(seed)
    ops = curve_ops(curve, grp)
    hc = ops.host_curve
    g = hc.generator
    ks = [rng.randrange(ops.spec.r) for _ in range(n)]
    hpts = [hc.mul(g, k) for k in ks]
    pts = ops.from_affine_host(hpts)

    # round-trip
    assert ops.to_affine_host(pts) == hpts

    # add
    q2 = ops.from_affine_host([hc.mul(g, k + 1) for k in ks])
    s = jax.jit(ops.add)(pts, q2)
    assert ops.to_affine_host(s) == [
        hc.add(h, hc.mul(g, k + 1)) for h, k in zip(hpts, ks)
    ]

    # doubling through the complete formulas
    d = jax.jit(ops.add)(pts, pts)
    assert ops.to_affine_host(d) == [hc.add(h, h) for h in hpts]

    # infinity identities
    inf = ops.infinity((n,))
    assert ops.to_affine_host(jax.jit(ops.add)(pts, inf)) == hpts

    if with_smul:
        sm = jax.jit(ops.scalar_mul)(ops.from_affine_host([g] * n), _scalars(ks, ops))
        assert ops.to_affine_host(sm) == hpts


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_bls12_377_group_law(grp):
    _check_group("bls12_377", grp)


def test_msm_matches_host():
    rng = random.Random(11)
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    n = 4
    hpts = [hc.mul(hc.generator, rng.randrange(ops.spec.r)) for _ in range(n)]
    ks = [rng.randrange(ops.spec.r) for _ in range(n)]
    out = jax.jit(ops.msm)(ops.from_affine_host(hpts), _scalars(ks, ops))
    expect = None
    for p, k in zip(hpts, ks):
        term = hc.mul(p, k)
        expect = term if expect is None else hc.add(expect, term)
    assert ops.to_affine_host(out)[0] == expect


@pytest.mark.slow
@pytest.mark.parametrize("curve", ALL_CURVES)
@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_all_curves_group_law(curve, grp):
    _check_group(curve, grp, with_smul=(curve == "bls12_377"))
