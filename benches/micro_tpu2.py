#!/usr/bin/env python
"""True per-op TPU costs via chained ops inside ONE jit (amortizes the
tunneled-dispatch floor that makes single-op timings meaningless --
measured: a lone field add and a lone mont_mul both "cost" ~80 ms at batch
16k through the axon tunnel).

Also measures raw VPU u32-multiply and f32-FMA throughput with a pallas
micro-kernel, giving the achievable ceiling for the limb pipeline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ITER = 64
    ops = curve_ops("bls12_377", "g1")
    F = ops.field
    hc = ops.host_curve
    rng = np.random.default_rng(7)
    pts = ops.from_affine_host(
        [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)] * (B // 4)
    )
    ks = [int.from_bytes(rng.bytes(31), "little") % ops.spec.r for _ in range(B)]
    sc = np.ascontiguousarray(ints_to_limbs_batch(ks, ops.fr.L).T)
    x, y = pts["x"], pts["y"]

    def chain(op, n=ITER):
        def f(a, b):
            def body(i, a):
                return op(a, b)
            return jax.lax.fori_loop(0, n, body, a)
        return jax.jit(f)

    t0 = timeit(chain(lambda a, b: a), x, y)  # loop overhead floor
    t_mul = (timeit(chain(F.mul), x, y) - t0) / ITER
    t_add = (timeit(chain(F.add), x, y) - t0) / ITER

    def gd(p, q):
        return ops.double(p)

    def ga(p, q):
        return ops.add(p, q)

    NG = 16
    t0g = timeit(chain(lambda p, q: p, NG), pts, pts)
    t_gdbl = (timeit(chain(gd, NG), pts, pts) - t0g) / NG
    t_gadd = (timeit(chain(ga, NG), pts, pts) - t0g) / NG

    t_lad = timeit(jax.jit(ops.scalar_mul), pts, sc)

    print(f"batch {B}, chained x{ITER} (per-op ms / per-elt ns):")
    print(f"  loop floor:   {t0*1e3:8.2f} ms total")
    print(f"  mont_mul:     {t_mul*1e3:8.3f}   {t_mul/B*1e9:8.1f} ns/elt")
    print(f"  field add:    {t_add*1e3:8.3f}   {t_add/B*1e9:8.1f} ns/elt")
    print(f"  group dbl:    {t_gdbl*1e3:8.3f}  = {t_gdbl/max(t_mul,1e-12):5.2f} muls")
    print(f"  group add:    {t_gadd*1e3:8.3f}  = {t_gadd/max(t_mul,1e-12):5.2f} muls")
    print(f"  ladder total: {t_lad*1e3:8.2f} ms -> {B/t_lad:8.0f} exp/s")
    pred = 129 * t_gdbl + 77 * t_gadd
    print(f"  pred(129d+77a): {pred*1e3:8.2f} ms ({100*pred/t_lad:5.1f}% of ladder)")

    # raw VPU ceilings: N chained elementwise multiplies in one pallas kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, LANES, NOP = 256, 512, 512

    def mk(dtype, op):
        def kernel(a_ref, b_ref, o_ref):
            a = a_ref[:]
            b = b_ref[:]
            def body(i, a):
                return op(a, b)
            o_ref[:] = jax.lax.fori_loop(0, NOP, body, a)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)

        return run

    au = (np.random.default_rng(1).integers(1, 1 << 15, (ROWS, LANES))).astype(np.uint32)
    af = au.astype(np.float32)
    n_el = ROWS * LANES * NOP
    t_u32 = timeit(mk(jnp.uint32, lambda a, b: a * b + jnp.uint32(1)), au, au)
    t_f32 = timeit(mk(jnp.float32, lambda a, b: a * b + 1.0), af, af)
    t_and = timeit(mk(jnp.uint32, lambda a, b: (a & b) + jnp.uint32(1)), au, au)
    t_shr = timeit(mk(jnp.uint32, lambda a, b: (a >> 7) + b), au, au)
    print(f"  VPU u32 mul+add: {n_el/t_u32/1e12:6.2f} Tops/s")
    print(f"  VPU f32 fma:     {n_el/t_f32/1e12:6.2f} Tops/s")
    print(f"  VPU u32 and+add: {n_el/t_and/1e12:6.2f} Tops/s")
    print(f"  VPU u32 shr+add: {n_el/t_shr/1e12:6.2f} Tops/s")


if __name__ == "__main__":
    main()
