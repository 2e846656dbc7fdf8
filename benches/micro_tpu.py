#!/usr/bin/env python
"""Micro-benchmark the TPU primitives that compose the hot ladder.

Times (batch 16384, BLS12-377 G1 / Fq) each layer in isolation so the
optimization target is chosen from data, not guesses:
  - mont_mul          single stacked product (S=1)
  - mul_stacked S=6   the group-law round shape
  - field add / sub
  - group double (9 muls, 3 rounds) / group add (14 muls, 3 rounds)
  - full GLV scalar_mul (the bench headline) + its predicted time from
    the measured dbl/add (gap = glue/dispatch overhead)

Run on the TPU box: python benches/micro_tpu.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snark_setup_tpu.fields.limb import ints_to_limbs_batch
from snark_setup_tpu.ops.curve_jax import curve_ops, _ID6


def timeit(f, *args, reps=5, sync=None):
    r = f(*args)
    if sync is None:
        sync = lambda r: np.asarray(jax.tree_util.tree_leaves(r)[0])
    sync(r)
    times = []
    for _ in range(reps):
        t0 = time.time()
        r = f(*args)
        sync(r)
        times.append(time.time() - t0)
    return min(times)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ops = curve_ops("bls12_377", "g1")
    F = ops.field
    fq = ops.fq
    hc = ops.host_curve
    rng = np.random.default_rng(7)

    pts = ops.from_affine_host(
        [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)] * (B // 4)
    )
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)

    x, y = pts["x"], pts["y"]

    mul1 = jax.jit(lambda a, b: F.mul(a, b))
    t_mul = timeit(mul1, x, y)

    st6 = jax.jit(
        lambda a, b: F.mul_stacked(
            F.stack([a, b, a, b, a, b]), F.stack([b, a, b, a, b, a]), _ID6, F.prod_nprod
        )
    )
    t_st6 = timeit(st6, x, y)

    addf = jax.jit(lambda a, b: F.add(a, b))
    t_add = timeit(addf, x, y)

    gdbl = jax.jit(ops.double)
    t_gdbl = timeit(gdbl, pts)

    gadd = jax.jit(lambda p: ops.add(p, p))
    t_gadd = timeit(gadd, pts)

    lad = jax.jit(ops.scalar_mul)
    t_lad = timeit(lad, pts, sc, reps=3)

    # ladder op counts: GLV w=4 over 128-bit halves
    nwin = 32
    n_dbl = 4 * nwin + 1  # window doubles + table double
    n_add = 2 * nwin + 13  # window adds + table adds
    pred = n_dbl * t_gdbl + n_add * t_gadd

    print(f"batch {B}  (times in ms, rate = B/t)")
    print(f"mont_mul (S=1):      {t_mul*1e3:8.2f}   {B/t_mul/1e6:6.2f} M/s")
    print(f"mul_stacked (S=6):   {t_st6*1e3:8.2f}   {6*B/t_st6/1e6:6.2f} M prod/s")
    print(f"field add:           {t_add*1e3:8.2f}   {B/t_add/1e6:6.2f} M/s")
    print(f"group double:        {t_gdbl*1e3:8.2f}  (9 muls -> {t_gdbl/t_mul:4.1f}x mul)")
    print(f"group add:           {t_gadd*1e3:8.2f}  (14 muls -> {t_gadd/t_mul:4.1f}x mul)")
    print(f"GLV scalar_mul:      {t_lad*1e3:8.2f}   {B/t_lad:8.0f} exp/s")
    print(f"predicted from dbl/add ({n_dbl} dbl + {n_add} add): {pred*1e3:8.2f} ms "
          f"-> {B/pred:8.0f} exp/s")
    print(f"glue/select/decompose overhead: {(t_lad-pred)*1e3:8.2f} ms "
          f"({100*(t_lad-pred)/t_lad:4.1f}%)")


if __name__ == "__main__":
    main()
