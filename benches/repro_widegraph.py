#!/usr/bin/env python
"""Repro kit for the XLA:TPU wide-graph silent-miscompile family
(VERDICT r4 #9 / KNOWN_ISSUES.md). One command reprints the measured
boundary tables that justify every lane bound in the codebase:

  python benches/repro_widegraph.py            # full sweep (~15 min warm)
  python benches/repro_widegraph.py quick      # decompose band only

Each probe computes a device graph at a given lane count and compares
EVERY sampled lane against exact host bigint math. "BAD" means silently
wrong limbs — no error, no NaN, just wrong numbers — which for a ceremony
tool is the worst possible failure mode; hence the hard slicing guards:

  graph class                      guard
  ------------------------------- -------------------------------------
  batch inversion / inv chains     codec_jax.BatchPointCodec.MAX_DEVICE_BATCH = 2^13
  compressed read (sqrt chain)     same (read_batch slices internally)
  GLV decompose (XLA path)         shard/runtime.SCALAR_MUL_MAX_LANES = 2^14
                                   (and the TPU default now uses the pallas
                                   decompose kernel, ops/pallas_glv.py)

Measured 2026-08-21/22 on v5e (jax 0.9.0): batch_inv BAD >= 13312;
fq.inv BAD >= 14336; unrolled 64-deep mont_mul chain BAD >= 13312;
GLV decompose BAD at exactly 32768/32769 (OK at 16384, 24576, 49152,
65536, 65537 — non-monotone!); fori_loop chains and single ops OK to
65536+.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_decompose(ops, B) -> str:
    """XLA GLV decompose at B lanes vs exact host model."""
    import jax

    from snark_setup_tpu.fields.limb import ints_to_limbs_batch, limbs_batch_to_ints

    rng = np.random.default_rng(42)
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    m1, n1, m2, n2 = jax.jit(ops.glv.decompose)(sc)
    m1h = limbs_batch_to_ints(np.asarray(m1).T)
    m2h = limbs_batch_to_ints(np.asarray(m2).T)
    n1h, n2h = np.asarray(n1), np.asarray(n2)
    lam, r = ops.glv.p.lam, ops.spec.r
    bad = 0
    idxs = list(range(0, B, max(1, B // 16)))
    for i in idxs:
        k1 = -m1h[i] if n1h[i] else m1h[i]
        k2 = -m2h[i] if n2h[i] else m2h[i]
        if (k1 + k2 * lam) % r != ks[i] % r:
            bad += 1
    return f"BAD ({bad}/{len(idxs)} sampled lanes wrong)" if bad else "OK"


def check_batch_inv(ops, B) -> str:
    import jax

    fq = ops.fq
    vals = [3, 5, 7, 11]
    a = np.concatenate([fq.from_int(v)[:, None] for v in vals], axis=1)
    a = np.tile(a, (1, -(-B // 4)))[:, :B]
    lane_vals = (vals * (B // 4 + 1))[:B]
    from snark_setup_tpu.ops.curve_jax import _generic_batch_inv
    from snark_setup_tpu.ops.ext_jax import make_field_ops

    F = make_field_ops(fq, 1, 0)
    out = jax.jit(lambda x: _generic_batch_inv(F, x))(a)
    from snark_setup_tpu.fields.limb import limbs_batch_to_ints

    std = np.asarray(jax.jit(fq.from_mont)(out))
    ints = limbs_batch_to_ints(std.T)
    q = ops.spec.q
    idxs = list(range(0, B, max(1, B // 16)))
    bad = sum(1 for i in idxs if ints[i] * lane_vals[i] % q != 1)
    return f"BAD ({bad}/{len(idxs)})" if bad else "OK"


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    from snark_setup_tpu.ops.curve_jax import curve_ops

    ops = curve_ops("bls12_377", "g1")
    print("# GLV decompose (XLA path) — the non-monotone band:")
    shapes = (16384, 32768, 32769, 65536) if quick else (
        12288, 16384, 24576, 32768, 32769, 49152, 65536, 65537
    )
    for B in shapes:
        print(f"  decompose @ {B:6d}: {check_decompose(ops, B)}", flush=True)
    if quick:
        return
    print("# batch inversion (associative-scan + Fermat):")
    for B in (12288, 13312, 16384):
        print(f"  batch_inv @ {B:6d}: {check_batch_inv(ops, B)}", flush=True)


if __name__ == "__main__":
    main()
