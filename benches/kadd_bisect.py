#!/usr/bin/env python
"""Bisect the fused complete-add kernel's cost by stage, on hardware.

The A/B (benches/groupop_ab.py) measured fused add ~5x the fused double
while the op-count ratio is ~1.6x — something in _kadd is pathological.
This times pallas kernels that run successive PREFIXES of _kadd:
  s0: round-0 operand sums only        (_stack_add 6-wide)
  s1: + round-0 products               (_stack_mul 6-wide)
  s2: + t3/t4/t5 + 3b round           (adds/subs + small-3b chains)
  s3: + round-2 (_stack_mul2)          (= full _kadd)
and, separately, the round-0 products at widths 1..6 to expose any
lane-concat width cliff. Usage: python benches/kadd_bisect.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snark_setup_tpu.ops.curve_jax import curve_ops
from snark_setup_tpu.ops import pallas_ladder as pk


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
    TB = 256
    NG = 16
    ops = curve_ops("bls12_377", "g1")
    fq = ops.fq
    L = fq.L
    from jax.experimental import pallas as pl

    N_col = np.asarray(fq.N, np.uint32)
    Np_col = np.asarray(fq.Nprime, np.uint32)
    b3_col = np.asarray(ops.b3_dev, np.uint32).reshape(L, 1)
    b3s = pk._b3s_for(ops)
    hc = ops.host_curve
    rng = np.random.default_rng(7)
    base = [hc.mul(hc.generator, int(k)) for k in rng.integers(1, 1 << 30, 4)]
    pts = ops.from_affine_host(base * (B // 4))
    coords = [pts["x"], pts["y"], pts["z"]] * 2

    def tile(c):
        return np.ascontiguousarray(np.broadcast_to(c, (L, TB)))

    consts = [tile(N_col), tile(Np_col), tile(b3_col)]

    def make(stage):
        def kernel(x1, y1, z1, x2, y2, z2, n_ref, np_ref, b3_ref, o_ref):
            N_b = n_ref[:]
            Np_b = np_ref[:]
            b3_b = b3_ref[:]
            NS = jnp.concatenate([N_b] * 6, axis=-1)
            NpS = jnp.concatenate([Np_b] * 6, axis=-1)
            X1, Y1, Z1, X2, Y2, Z2 = (r[:] for r in (x1, y1, z1, x2, y2, z2))
            sums = pk._stack_add(
                [(X1, Y1), (X1, Z1), (Y1, Z1), (X2, Y2), (X2, Z2), (Y2, Z2)],
                NS, TB,
            )
            if stage == 0:
                o_ref[:] = sums[0]
                return
            t0, t1, t2, s3, s4, s5 = pk._stack_mul(
                [(X1, X2), (Y1, Y2), (Z1, Z2), (sums[0], sums[3]),
                 (sums[1], sums[4]), (sums[2], sums[5])],
                NS, NpS, TB,
            )
            if stage == 1:
                o_ref[:] = t0
                return
            a01, a02, a12 = pk._stack_add([(t0, t1), (t0, t2), (t1, t2)], NS, TB)
            t3, t4, t5 = pk._stack_sub([(s3, a01), (s4, a02), (s5, a12)], NS, TB)
            w, negate, _ = b3s
            pair = jnp.concatenate([t2, t4], axis=-1)
            acc, addend, k = None, pair, w
            N2 = NS[:, : 2 * TB]
            while k:
                if k & 1:
                    acc = addend if acc is None else pk._fadd(acc, addend, N2)
                k >>= 1
                if k:
                    addend = pk._fadd(addend, addend, N2)
            if negate:
                acc = pk._fneg(acc, N2)
            Z3_, t4b = pk._split(acc, 2, TB)
            t1n = pk._fadd(pk._fadd(t0, t0, N_b), t0, N_b)
            X3_ = pk._fsub(t1, Z3_, N_b)
            Z3p = pk._fadd(t1, Z3_, N_b)
            if stage == 2:
                o_ref[:] = X3_
                return
            y, x, z = pk._stack_mul2(
                [
                    (X3_, Z3p, t1n, t4b),
                    (t3, X3_, pk._fneg(t5, N_b), t4b),
                    (t5, Z3p, t3, t1n),
                ],
                NS, NpS, TB,
            )
            o_ref[:] = x

        coord = pl.BlockSpec((L, TB), lambda i: (0, i))
        const = pl.BlockSpec((L, TB), lambda i: (0, 0))
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=(B // TB,),
            in_specs=[coord] * 6 + [const] * 3,
            out_specs=coord,
        )

        @jax.jit
        def chained(*a):
            def body(i, acc):
                out = call(acc, *a[1:6], *consts)
                return out

            return jax.lax.fori_loop(0, NG, body, a[0])

        return chained

    floor = None
    for stage in (0, 1, 2, 3):
        f = make(stage)
        t = timeit(f, *coords) / NG
        print(f"stage {stage}: {t*1e3:7.3f} ms", flush=True)

    # width sweep: S independent products through one _stack_mul
    for S in (1, 2, 4, 6):
        def mk(S=S):
            def kernel(x1, y1, n_ref, np_ref, o_ref):
                N_b = n_ref[:]
                Np_b = np_ref[:]
                NS = jnp.concatenate([N_b] * S, axis=-1)
                NpS = jnp.concatenate([Np_b] * S, axis=-1)
                outs = pk._stack_mul([(x1[:], y1[:])] * S, NS, NpS, TB)
                o_ref[:] = outs[0]

            coord = pl.BlockSpec((L, TB), lambda i: (0, i))
            const = pl.BlockSpec((L, TB), lambda i: (0, 0))
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
                grid=(B // TB,),
                in_specs=[coord] * 2 + [const] * 2,
                out_specs=coord,
            )

            @jax.jit
            def chained(a, b):
                return jax.lax.fori_loop(0, NG, lambda i, acc: call(acc, b, consts[0], consts[1]), a)

            return chained

        t = timeit(mk(), coords[0], coords[1]) / NG
        print(f"stack width {S}: {t*1e3:7.3f} ms ({t/S*1e3:6.3f} ms/product)", flush=True)


if __name__ == "__main__":
    main()
