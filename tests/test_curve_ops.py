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


def test_dedicated_doubling_matches_add():
    """double() (RCB Alg 9 for a=0) vs add(p, p), incl. infinity."""
    rng = random.Random(13)
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    hpts = [hc.mul(hc.generator, rng.randrange(1, ops.spec.r)) for _ in range(3)]
    pts = ops.from_affine_host(hpts + [hc.mul(hc.generator, 0)])  # + infinity
    d = jax.jit(ops.double)(pts)
    want = [hc.add(h, h) for h in hpts] + [hc.mul(hc.generator, 0)]
    assert ops.to_affine_host(d) == want


def test_windowed_scalar_mul_matches_binary():
    """The w=4 windowed kernel vs the simple double-and-add oracle, with
    edge scalars 0 / 1 / r-1."""
    rng = random.Random(17)
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    ks = [0, 1, ops.spec.r - 1, rng.randrange(ops.spec.r)]
    hpts = [hc.mul(hc.generator, 3 + i) for i in range(len(ks))]
    pts = ops.from_affine_host(hpts)
    sc = _scalars(ks, ops)
    win = ops.to_affine_host(jax.jit(ops.scalar_mul)(pts, sc))
    binary = ops.to_affine_host(jax.jit(ops.scalar_mul_binary)(pts, sc))
    host = [hc.mul(p, k) for p, k in zip(hpts, ks)]
    assert win == host
    assert binary == host


@pytest.mark.slow
@pytest.mark.parametrize("curve", ALL_CURVES)
@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_all_curves_group_law(curve, grp):
    _check_group(curve, grp, with_smul=(curve == "bls12_377"))
