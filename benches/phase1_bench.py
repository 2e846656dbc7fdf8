#!/usr/bin/env python
"""Criterion-analog micro-benchmarks: initialization / computation /
verification across powers (reference phase1/benches/phase1.rs:16-166,
whose verification bench ships with a stale signature — fixed here by
construction).

Usage: python benches/phase1_bench.py [--powers 4 6 8] [--batch 256]
       [--curve bls12_377] [--proving-system groth16]
Prints one JSON line per (op, power) with wall seconds.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snark_setup_tpu.phase1.parameters import Phase1Parameters  # noqa: E402
from snark_setup_tpu.phase1.protocol import Phase1  # noqa: E402
from snark_setup_tpu.phase1.testing import (  # noqa: E402
    generate_input,
    generate_output,
    setup_verify,
)
from snark_setup_tpu.utils.enums import (  # noqa: E402
    BatchExpMode,
    CheckForCorrectness,
    ProvingSystem,
    SubgroupCheckMode,
    UseCompression,
)


def bench(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--powers", type=int, nargs="+", default=[4, 6, 8])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--curve", default="bls12_377")
    ap.add_argument("--proving-system", default="groth16")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    ps = ProvingSystem(args.proving_system)
    for power in args.powers:
        params = Phase1Parameters.new_full(args.curve, ps, power, args.batch)

        out = generate_output(params, UseCompression.NO)
        dt = bench(lambda: Phase1.initialization(out, UseCompression.NO, params), args.reps)
        print(json.dumps({"op": "initialization", "power": power, "seconds": round(dt, 4)}))

        inp, outc, pubkey, privkey, digest = setup_verify(
            UseCompression.NO, CheckForCorrectness.NO, UseCompression.YES, params
        )

        def compute():
            o = generate_output(params, UseCompression.YES)
            Phase1.computation(
                inp, o, UseCompression.NO, UseCompression.YES,
                CheckForCorrectness.NO, BatchExpMode.AUTO, privkey, params,
            )

        dt = bench(compute, args.reps)
        print(json.dumps({"op": "computation", "power": power, "seconds": round(dt, 4)}))

        def verify():
            nc = generate_output(params, UseCompression.NO)
            Phase1.verification(
                inp, outc, nc, pubkey, digest,
                UseCompression.NO, UseCompression.YES, UseCompression.NO,
                CheckForCorrectness.NO, CheckForCorrectness.FULL,
                SubgroupCheckMode.AUTO, True, params,
            )

        dt = bench(verify, args.reps)
        print(json.dumps({"op": "verification", "power": power, "seconds": round(dt, 4)}))


if __name__ == "__main__":
    main()
