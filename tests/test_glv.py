"""GLV endomorphism: decomposition, fast scalar-mul, endo subgroup check.

Covers ops/glv.py + the GLV paths in ops/curve_jax.py / ops/codec_jax.py.
The correctness contract being exercised:
- decompose: k1 + k2*lambda = k (mod r), |ki| within the bit budget,
  device output bit-identical to the host integer model;
- scalar_mul (GLV path): equals the host oracle for subgroup points,
  including edge scalars and infinity inputs;
- subgroup_mask_direct (endo check): accepts subgroup points, rejects
  on-curve points outside the prime-order subgroup.
"""

import numpy as np
import pytest

from snark_setup_tpu.fields.limb import (
    LimbSpec,
    ints_to_limbs_batch,
    limbs_batch_to_ints,
)
from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.ops.glv import GLVOps, derive_glv

GLV_GROUPS = [
    ("bls12_377", "g1"),
    ("bls12_377", "g2"),
    ("bls12_381", "g1"),
    ("bw6", "g1"),
]


def _edge_scalars(r, lam):
    return [0, 1, 2, 3, r - 1, r - 2, (r + 1) // 2, (r - 1) // 2, lam, r - lam, lam + 1]


@pytest.mark.parametrize("curve,group", GLV_GROUPS)
def test_decompose_device_matches_host_model(curve, group):
    params = derive_glv(curve, group)
    assert params is not None
    g = GLVOps(params, LimbSpec(params.r).n_limbs)
    rng = np.random.default_rng(7)
    ks = [int.from_bytes(rng.bytes(48), "little") % params.r for _ in range(24)]
    ks += _edge_scalars(params.r, params.lam)
    raw = np.ascontiguousarray(ints_to_limbs_batch(ks, g.Ls).T)
    m1, n1, m2, n2 = (np.asarray(v) for v in g.decompose(raw))
    for i, k in enumerate(ks):
        k1, k2 = g.decompose_host(k)
        assert abs(k1).bit_length() <= params.nbits
        assert abs(k2).bit_length() <= params.nbits
        assert (k1 + k2 * params.lam - k) % params.r == 0
        d1 = limbs_batch_to_ints(m1[:, i][None, :])[0]
        d2 = limbs_batch_to_ints(m2[:, i][None, :])[0]
        assert d1 == abs(k1) and bool(n1[i]) == (k1 < 0), (i, k)
        assert d2 == abs(k2) and bool(n2[i]) == (k2 < 0), (i, k)


@pytest.mark.parametrize("curve,group", GLV_GROUPS)
def test_glv_scalar_mul_matches_host(curve, group):
    ops = curve_ops(curve, group)
    assert ops.glv is not None
    hc = ops.host_curve
    rng = np.random.default_rng(11)
    base = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 28, 5)]
    from snark_setup_tpu.curves.host import INFINITY

    base.append(INFINITY)
    ks = [int.from_bytes(rng.bytes(48), "little") % ops.spec.r for _ in range(4)]
    ks += [0, 1, ops.spec.r - 1]
    pts_host = [base[i % len(base)] for i in range(len(ks))]
    pts = ops.from_affine_host(pts_host)
    raw = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    got = ops.to_affine_host(ops.scalar_mul(pts, raw))
    for p, k, g in zip(pts_host, ks, got):
        assert g == hc.mul(p, k), (curve, group, k)


def test_glv_matches_windowed_ladder():
    """On subgroup points the GLV path and the raw windowed ladder agree."""
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(3)
    pts_host = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 20, 6)]
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(6)]
    pts = ops.from_affine_host(pts_host)
    raw = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    a = ops.to_affine_host(ops._scalar_mul_glv(pts, raw))
    b = ops.to_affine_host(ops.scalar_mul_windowed(pts, raw))
    assert a == b


@pytest.mark.parametrize("curve", ["bls12_377", "bls12_381"])
def test_endo_subgroup_check(curve):
    """phi(P) == [e]P accepts the subgroup and rejects h-torsion points."""
    from snark_setup_tpu.ops.codec_jax import batch_codec

    codec = batch_codec(curve, "g1")
    ops = codec.ops
    assert ops._endo_check is not None
    hc = ops.host_curve
    spec = ops.spec

    # in-subgroup points (and infinity)
    rng = np.random.default_rng(5)
    good = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 30, 3)]
    from snark_setup_tpu.curves.host import AffinePoint, INFINITY

    good.append(INFINITY)

    # an on-curve point NOT in the prime-order subgroup: random x with valid
    # y, cofactor deliberately NOT cleared (cofactor > 1 for BLS G1)
    from snark_setup_tpu.fields.host import tonelli_shanks_sqrt

    assert spec.g1.cofactor > 1
    bad = None
    x = 5
    while bad is None:
        x += 1
        rhs = (x**3 + spec.g1.a[0] * x + spec.g1.b[0]) % spec.q
        y = tonelli_shanks_sqrt(rhs, spec.q)
        if y is None:
            continue
        cand = AffinePoint(spec.fp(x), spec.fp(y))
        if not hc.in_subgroup(cand):
            bad = cand
    pts = ops.from_affine_host(good + [bad])
    mask = np.asarray(codec.subgroup_mask_direct(pts))
    assert mask[: len(good)].all()
    assert not mask[len(good)]


def test_endo_subgroup_check_matches_order_mul():
    """Endo check and the classic r*P == O check agree on mixed inputs."""
    from snark_setup_tpu.ops.codec_jax import batch_codec

    codec = batch_codec("bls12_377", "g1")
    ops = codec.ops
    hc = ops.host_curve
    rng = np.random.default_rng(9)
    pts_host = [hc.mul(hc.generator, int(m)) for m in rng.integers(1, 1 << 16, 4)]
    pts = ops.from_affine_host(pts_host)
    B = len(pts_host)
    r_limbs = np.broadcast_to(codec._r_limbs[:, None], (ops.fr.L, B))
    classic = np.asarray(ops.is_infinity(ops.scalar_mul_windowed(pts, r_limbs)))
    endo = np.asarray(codec.subgroup_mask_direct(pts))
    assert (classic == endo).all()


def test_pallas_digits_match_xla_decompose():
    """The fused decompose+digits pallas kernel (interpret mode) is
    bit-exact with the XLA decompose + scalar_digits_msb pipeline."""
    import jax.numpy as jnp

    from snark_setup_tpu.fields.limb import ints_to_limbs_batch
    from snark_setup_tpu.ops.curve_jax import curve_ops
    from snark_setup_tpu.ops.pallas_glv import PallasGLVDigits

    for curve, group in (("bls12_377", "g1"), ("bw6_761", "g2")):
        ops = curve_ops(curve, group)
        if ops.glv is None:
            continue
        rng = np.random.default_rng(11)
        B = 8
        ks = [int.from_bytes(rng.bytes(40), "little") % ops.spec.r for _ in range(B)]
        ks[0] = 0
        ks[1] = 1
        ks[2] = ops.spec.r - 1
        sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)

        m1, neg1, m2, neg2 = ops.glv.decompose(sc)
        e1 = np.asarray(ops.scalar_digits_msb(m1, ops.WINDOW, ops.glv.p.nbits))
        e2 = np.asarray(ops.scalar_digits_msb(m2, ops.WINDOW, ops.glv.p.nbits))
        eneg = np.asarray(neg1)
        eflip = np.asarray(neg1 != neg2)

        dig = PallasGLVDigits(ops)
        d1, d2, neg, flip = dig(jnp.asarray(sc), interpret=True)
        assert (np.asarray(d1) == e1).all(), f"{curve}/{group} d1 mismatch"
        assert (np.asarray(d2) == e2).all(), f"{curve}/{group} d2 mismatch"
        assert (np.asarray(neg).astype(bool) == eneg).all()
        assert (np.asarray(flip).astype(bool) == eflip).all()
