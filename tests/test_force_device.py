"""Force-device lane (VERDICT r4 #7): the device graphs that CPU backends
normally bypass via host fallback (ops/msm.host_fallback_enabled) are run
HERE with SNARK_SETUP_FORCE_DEVICE_MSM=1 and checked for equivalence
against the host math they replace.

Slow-marked: each forced path costs a minutes-long, crash-prone XLA:CPU
ladder compile (KNOWN_ISSUES.md #3) — exactly why the default tier skips
these graphs. scripts/test_force_device.sh runs this file as its own
process (weekly tier)."""

import numpy as np
import pytest

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.codec_jax import batch_codec
from snark_setup_tpu.ops.curve_jax import curve_ops

pytestmark = pytest.mark.slow


@pytest.fixture
def force_device(monkeypatch):
    monkeypatch.setenv("SNARK_SETUP_FORCE_DEVICE_MSM", "1")


def test_msm_secret_device_matches_host(force_device):
    from snark_setup_tpu.ops.msm import _host_msm, msm_secret

    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(3)
    pts_host = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 20, 8)]
    ks = [int(k) for k in rng.integers(1, 1 << 62, 8)]
    pts = ops.from_affine_host(pts_host)
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    dev = ops.to_affine_host(msm_secret(ops, pts, sc))[0]
    host = ops.to_affine_host(_host_msm(ops, pts, sc))[0]
    assert dev == host


def test_direct_subgroup_device_matches_host(force_device):
    codec = batch_codec("bls12_377", "g1")
    ops = codec.ops
    hc = ops.host_curve
    rng = np.random.default_rng(5)
    pts_host = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 16, 4)]
    pts = ops.from_affine_host(pts_host)
    dev_mask = np.asarray(codec.subgroup_mask(pts))
    host_mask = codec.subgroup_mask_host(pts)
    assert (dev_mask == host_mask).all()
    assert dev_mask.all()  # generator multiples are in the subgroup


def test_batch_mul_device_matches_host(force_device):
    from snark_setup_tpu.phase2.parameters import batch_mul_device

    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(7)
    pts_host = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 18, 6)]
    scalar = 0x1234567890ABCDEF1234567890ABCDEF
    dev = batch_mul_device(ops, pts_host, scalar)
    host = [hc.mul(p, scalar) for p in pts_host]
    assert dev == host
