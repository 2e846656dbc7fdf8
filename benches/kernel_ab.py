#!/usr/bin/env python
"""A/B the three TPU mul_stacked configs at bench batch size, with a
host-oracle correctness spot check (the v1 fused-u32 pallas kernel was
suspected of a batch>=2^14 miscompile — verify, don't assume).

Usage: SNARK_SETUP_KERNEL_V2=? SNARK_SETUP_MXU_REDC=? python benches/kernel_ab.py
Prints: config, exp/s, and OK/MISMATCH on 8 sampled lanes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops


def main():
    B = int(os.environ.get("SNARK_BENCH_BATCH", "16384"))
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(42)
    base_pts = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)]
    pts = ops.from_affine_host([base_pts[i % 4] for i in range(B)])
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)

    f = jax.jit(ops.scalar_mul)
    r = f(pts, sc)
    _ = np.asarray(r["x"])
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = f(pts, sc)
        _ = np.asarray(r["x"])
        ts.append(time.time() - t0)
    rate = B / min(ts)

    # correctness: sample lanes incl. the top of the batch
    idx = [0, 1, B // 2, B - 3, B - 2, B - 1, 12288, 12289]
    sub = {k: np.asarray(v)[..., idx] for k, v in r.items()}
    from snark_setup_tpu.ops.curve_jax import PointVec

    got = ops.to_affine_host(PointVec(sub))
    ok = all(
        got[j] == hc.mul(base_pts[i % 4], ks[i]) for j, i in enumerate(idx)
    )
    cfg = (
        f"v2={os.environ.get('SNARK_SETUP_KERNEL_V2', 'auto')} "
        f"mxu={os.environ.get('SNARK_SETUP_MXU_REDC', 'auto')}"
    )
    print(f"{cfg}  {rate:8.0f} exp/s  {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
