"""Group-element NTT vs the host scalar oracle.

The device IFFT of [k_i·G] must equal [c_i·G] where c = ifft(k) over Fr —
linearity makes the scalar transform an exact oracle for the group one.
"""

import numpy as np
import pytest

from snark_setup_tpu.ntt.domain import Radix2Domain, domain_size, fr_generator
from snark_setup_tpu.ntt.group_fft import group_fft, h_query_device
from snark_setup_tpu.ops.curve_jax import curve_ops


def _points_from_scalars(ops, ks):
    hc = ops.host_curve
    return ops.from_affine_host([hc.mul(hc.generator, k) for k in ks])


def test_domain_basics():
    d = Radix2Domain("bls12_377", 7)
    assert d.size == 8
    assert domain_size("bls12_377", 7) == 8
    # fft/ifft roundtrip on scalars
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    assert d.ifft(d.fft(vals)) == vals
    # evaluations really are polynomial evaluations
    coeffs = [2, 7, 1, 8]
    evs = d.fft(coeffs)
    for x, e in zip(d.elements(), evs):
        assert e == sum(c * pow(x, i, d.r) for i, c in enumerate(coeffs)) % d.r


def test_fr_generator_nonresidue():
    for name in ("bls12_377", "bls12_381", "bw6_761", "mnt4_753", "mnt6_753"):
        g = fr_generator(name)
        from snark_setup_tpu.curves.constants import get_curve

        r = get_curve(name).r
        assert pow(g, (r - 1) // 2, r) == r - 1


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_group_ifft_matches_scalar_oracle(group):
    n = 8
    ops = curve_ops("bls12_377", group)
    d = Radix2Domain("bls12_377", n)
    rng = np.random.default_rng(42)
    ks = [int(rng.integers(1, 1 << 62)) for _ in range(n)]

    pts = _points_from_scalars(ops, ks)
    gf = group_fft("bls12_377", group, n)
    out = gf.ifft(pts)
    got = ops.to_affine_host(out)

    want_scalars = d.ifft(ks)
    hc = ops.host_curve
    want = [hc.mul(hc.generator, c) for c in want_scalars]
    assert got == want


def test_group_fft_ifft_roundtrip():
    n = 8
    ops = curve_ops("bls12_377", "g1")
    rng = np.random.default_rng(7)
    ks = [int(rng.integers(1, 1 << 62)) for _ in range(n)]
    pts = _points_from_scalars(ops, ks)
    gf = group_fft("bls12_377", "g1", n)
    back = ops.to_affine_host(gf.ifft(gf.fft(pts)))
    want = ops.to_affine_host(pts)
    assert back == want


def test_h_query_device():
    m = 4
    ops = curve_ops("bls12_377", "g1")
    ks = [3, 1, 4, 1, 5, 9, 2]  # 2m-1 powers
    pts = _points_from_scalars(ops, ks)
    h = h_query_device(ops, pts, m)
    got = ops.to_affine_host(h)
    hc = ops.host_curve
    want = [
        hc.add(hc.mul(hc.generator, ks[i + m]), hc.neg(hc.mul(hc.generator, ks[i])))
        for i in range(m - 1)
    ]
    assert got == want


def test_staged_fft_matches_scan_path(monkeypatch):
    """The host-level staged stage-loop (used above STAGE_SCAN_MAX, where
    the whole-FFT program crashes the TPU worker) is bit-identical to the
    lax.scan path."""
    from snark_setup_tpu.ntt.group_fft import GroupFFT
    from snark_setup_tpu.ntt.domain import Radix2Domain
    from snark_setup_tpu.ops.curve_jax import curve_ops

    ops = curve_ops("bls12_377", "g1")
    n = 16
    hc = ops.host_curve
    pts = ops.from_affine_host([hc.mul(hc.generator, 3 + i) for i in range(n)])

    scan_fft = GroupFFT(ops, Radix2Domain("bls12_377", n))
    expect = ops.to_affine_host(scan_fft.ifft(pts))

    monkeypatch.setattr(GroupFFT, "STAGE_SCAN_MAX", 8)
    staged_fft = GroupFFT(ops, Radix2Domain("bls12_377", n))
    got = ops.to_affine_host(staged_fft.ifft(pts))
    assert got == expect
