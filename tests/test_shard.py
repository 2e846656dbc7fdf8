"""Multi-device mesh tests on the 8-virtual-device CPU mesh (conftest):
the sharded contribution step, the cross-chip MSM reduction, and the
distributed group IFFT, each checked against the host bigint oracle.

These are the SURVEY §2.3 "distributed backend" gates: the same functions
are what `__graft_entry__.dryrun_multichip` compiles for the driver.
"""

import numpy as np
import pytest

from snark_setup_tpu.fields.limb import ints_to_limbs_batch, limbs_batch_to_ints
from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.shard.mesh import (
    make_mesh,
    sharded_batch_exp_fn,
    sharded_group_ifft_fn,
    sharded_msm_fn,
    sharded_step_fn,
)

N_DEV = 4
BATCH = 8  # 2 per shard


@pytest.fixture(scope="module")
def mesh():
    import jax

    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


@pytest.fixture(scope="module")
def example():
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    base = [hc.mul(hc.generator, 3 + i) for i in range(BATCH)]
    pts = ops.from_affine_host(base)
    ks = [(123456789 + 987654321 * i) % ops.spec.r for i in range(BATCH)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    return ops, base, pts, ks, sc


def test_sharded_step_matches_host(mesh, example):
    """One compile: sharded batch_exp products + all-gathered MSM total."""
    ops, base, pts, ks, sc = example
    hc = ops.host_curve
    prods, total = sharded_step_fn(ops, mesh)(pts, sc)
    aff = ops.to_affine_host(prods)
    expect_msm = None
    for p, k, got in zip(base, ks, aff):
        e = hc.mul(p, k)
        assert got == e
        expect_msm = e if expect_msm is None else hc.add(expect_msm, e)
    assert ops.to_affine_host(total)[0] == expect_msm


def test_sharded_batch_exp_and_msm_separate(mesh, example):
    ops, base, pts, ks, sc = example
    hc = ops.host_curve
    out = sharded_batch_exp_fn(ops, mesh)(pts, sc)
    aff = ops.to_affine_host(out)
    for p, k, got in zip(base, ks, aff):
        assert got == hc.mul(p, k)
    res = sharded_msm_fn(ops, mesh)(pts, sc)
    expect = None
    for p, k in zip(base, ks):
        t = hc.mul(p, k)
        expect = t if expect is None else hc.add(expect, t)
    assert ops.to_affine_host(res)[0] == expect


def test_sharded_group_ifft_matches_single_device(mesh, example):
    ops, base, pts, ks, sc = example
    from snark_setup_tpu.ntt.group_fft import group_fft

    gf = group_fft("bls12_377", "g1", BATCH)
    want = ops.to_affine_host(gf.ifft(pts))
    ifft = sharded_group_ifft_fn("bls12_377", "g1", BATCH, mesh)
    got = ops.to_affine_host(ifft(pts))
    assert got == want
