#!/usr/bin/env python
"""A/B of the fused single-launch group-op kernels (ops/pallas_group.py)
vs the stacked-round group law, on real hardware.

Measures chained per-op cost (one jit, fori_loop — amortizes the tunneled
dispatch floor), the full GLV ladder exp/s both ways, and host-oracle
correctness on sampled lanes. Usage: python benches/groupop_ab.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops


def timeit(f, *args, reps=3):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.time() - t0)
    return min(ts)


def chain(op, n):
    def f(a, b):
        def body(i, a):
            return op(a, b)

        return jax.lax.fori_loop(0, n, body, a)

    return jax.jit(f)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    NG = 16
    ops = curve_ops("bls12_377", "g1")
    hc = ops.host_curve
    rng = np.random.default_rng(7)
    base = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)]
    pts = ops.from_affine_host(base * (B // 4))
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)

    results = {}
    for label, flag in (("stacked", "0"), ("fused", "1")):
        os.environ["SNARK_SETUP_GROUP_FUSED"] = flag
        t0g = timeit(chain(lambda p, q: p, NG), pts, pts)
        t_dbl = (timeit(chain(lambda p, q: ops.double(p), NG), pts, pts) - t0g) / NG
        t_add = (timeit(chain(ops.add, NG), pts, pts) - t0g) / NG
        t_lad = timeit(jax.jit(ops.scalar_mul), pts, sc)
        results[label] = (t_dbl, t_add, t_lad)
        print(
            f"{label:8s} B={B}: dbl {t_dbl*1e3:7.3f} ms  add {t_add*1e3:7.3f} ms"
            f"  ladder {t_lad*1e3:8.1f} ms -> {B/t_lad:8.0f} exp/s",
            flush=True,
        )

    # correctness: fused ladder output vs host oracle on sampled lanes
    os.environ["SNARK_SETUP_GROUP_FUSED"] = "1"
    out = ops.to_affine_host(ops.scalar_mul(pts, sc))
    idx = [0, 1, B // 2, B - 1]
    for i in idx:
        want = hc.mul(base[i % 4], ks[i] % ops.spec.r)
        assert out[i] == want, f"lane {i} mismatch"
    print(f"oracle OK on lanes {idx}")
    sd, sa, sl = results["stacked"]
    fd, fa, fl = results["fused"]
    print(
        f"speedup: dbl {sd/fd:5.2f}x  add {sa/fa:5.2f}x  ladder {sl/fl:5.2f}x"
    )


if __name__ == "__main__":
    main()
