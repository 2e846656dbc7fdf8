#!/usr/bin/env python
"""Math micro-benchmarks: tau-power generation, batch exponentiation, MSM
(reference setup-utils/benches/math.rs:42-96). One JSON line per op."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[256, 1024, 4096])
    ap.add_argument("--curve", default="bls12_377")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from snark_setup_tpu.fields.limb import ints_to_limbs_batch
    from snark_setup_tpu.ops.curve_jax import curve_ops
    from snark_setup_tpu.phase1.protocol import _tau_powers_raw

    ops = curve_ops(args.curve, "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(1)

    for B in args.batch:
        # powers of tau
        tau = 123456789
        f = lambda: np.asarray(_tau_powers_raw(ops.fr, tau, 0, B, None))
        f()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            f()
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"op": "powers_of_tau", "batch": B, "seconds": round(dt, 5)}))

        base = [hc.mul(hc.generator, 3 + (i % 5)) for i in range(B)]
        pts = ops.from_affine_host(base)
        ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
        sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)

        sm = jax.jit(ops.scalar_mul)
        np.asarray(sm(pts, sc)["x"])  # warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            np.asarray(sm(pts, sc)["x"])
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"op": "batch_exp", "batch": B, "seconds": round(dt, 5),
                          "exp_per_s": round(B / dt, 1)}))

        ms = jax.jit(ops.msm)
        np.asarray(ms(pts, sc)["x"])  # warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            np.asarray(ms(pts, sc)["x"])
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"op": "msm", "batch": B, "seconds": round(dt, 5)}))


if __name__ == "__main__":
    main()
