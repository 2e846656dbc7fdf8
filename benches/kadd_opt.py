#!/usr/bin/env python
"""Clean attribution of the fused group-op kernels (VERDICT r4 #2).

The r4 chained timings (kadd_bisect.py) were transfer-bound: numpy inputs
were re-uploaded through the tunnel on every timed call (~6 ms for 9 MB of
coords at B=16k), which is why a stage-0-only kernel timed ABOVE the full
kernel. This harness device_puts every input once, chains NG kernel
applications inside one jit, and subtracts an identity-kernel floor, so
per-op cost is kernel compute only.

Usage: python benches/kadd_opt.py [B] [NG]
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


def timeit(f, *args, reps=5):
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
    NG = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    TB = int(os.environ.get("SNARK_SETUP_GROUP_TILE_B", "256"))
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
    coords = [jax.device_put(np.asarray(a)) for a in (pts["x"], pts["y"], pts["z"])] * 2

    def tile(c):
        return np.ascontiguousarray(np.broadcast_to(c, (L, TB)))

    consts = [tile(N_col), tile(Np_col), tile(b3_col)]
    coord = pl.BlockSpec((L, TB), lambda i: (0, i))
    const = pl.BlockSpec((L, TB), lambda i: (0, 0))

    def chain3(call, n_in):
        """Chain NG applications, carrying (x, y, z)."""

        @jax.jit
        def f(*a):
            def body(i, acc):
                return call(*acc, *a[3:n_in], *consts)

            return jax.lax.fori_loop(0, NG, body, tuple(a[:3]))

        return f

    results = {}

    def bench(name, kernel_body, n_in):
        call = pl.pallas_call(
            kernel_body,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, B), jnp.uint32) for _ in range(3)
            ),
            grid=(B // TB,),
            in_specs=[coord] * n_in + [const] * 3,
            out_specs=(coord, coord, coord),
        )
        f = chain3(call, n_in)
        t = timeit(f, *coords[:n_in]) / NG
        results[name] = t
        print(f"{name:28s}: {t*1e3:7.3f} ms", flush=True)
        return t

    # floor: copy-through kernel
    def k_id(x, y, z, n_ref, np_ref, b3_ref, ox, oy, oz):
        ox[:] = x[:]
        oy[:] = y[:]
        oz[:] = z[:]

    bench("identity (floor)", k_id, 3)

    def k_dbl(x, y, z, n_ref, np_ref, b3_ref, ox, oy, oz):
        N_b, Np_b, b3_b = n_ref[:], np_ref[:], b3_ref[:]
        NS = jnp.concatenate([N_b] * 4, axis=-1)
        NpS = jnp.concatenate([Np_b] * 4, axis=-1)
        x3, y3, z3 = pk._kdbl((x[:], y[:], z[:]), N_b, Np_b, b3_b, NS, NpS, TB, b3s)
        ox[:] = x3
        oy[:] = y3
        oz[:] = z3

    bench("double (prod)", k_dbl, 3)

    def k_add(x, y, z, x2, y2, z2, n_ref, np_ref, b3_ref, ox, oy, oz):
        N_b, Np_b, b3_b = n_ref[:], np_ref[:], b3_ref[:]
        NS = jnp.concatenate([N_b] * 6, axis=-1)
        NpS = jnp.concatenate([Np_b] * 6, axis=-1)
        x3, y3, z3 = pk._kadd(
            (x[:], y[:], z[:]), (x2[:], y2[:], z2[:]),
            N_b, Np_b, b3_b, NS, NpS, TB, b3s,
        )
        ox[:] = x3
        oy[:] = y3
        oz[:] = z3

    bench("add (prod)", k_add, 6)

    # --- staged prefixes of the add (device-resident, honest this time) ---
    def stage_kernel(stage):
        def kernel(x1, y1, z1, x2, y2, z2, n_ref, np_ref, b3_ref, ox, oy, oz):
            N_b, Np_b, b3_b = n_ref[:], np_ref[:], b3_ref[:]
            NS = jnp.concatenate([N_b] * 6, axis=-1)
            NpS = jnp.concatenate([Np_b] * 6, axis=-1)
            X1, Y1, Z1 = x1[:], y1[:], z1[:]
            X2, Y2, Z2 = x2[:], y2[:], z2[:]
            sums = pk._stack_add(
                [(X1, Y1), (X1, Z1), (Y1, Z1), (X2, Y2), (X2, Z2), (Y2, Z2)],
                NS, TB,
            )
            if stage == 0:
                ox[:], oy[:], oz[:] = sums[0], sums[1], sums[2]
                return
            t0, t1, t2, s3, s4, s5 = pk._stack_mul(
                [(X1, X2), (Y1, Y2), (Z1, Z2), (sums[0], sums[3]),
                 (sums[1], sums[4]), (sums[2], sums[5])],
                NS, NpS, TB,
            )
            if stage == 1:
                ox[:], oy[:], oz[:] = t0, t1, t2
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
                ox[:], oy[:], oz[:] = X3_, Z3p, t1n
                return
            y, x, z = pk._stack_mul2(
                [
                    (X3_, Z3p, t1n, t4b),
                    (t3, X3_, pk._fneg(t5, N_b), t4b),
                    (t5, Z3p, t3, t1n),
                ],
                NS, NpS, TB,
            )
            ox[:], oy[:], oz[:] = x, y, z

        return kernel

    for st in (0, 1, 2, 3):
        bench(f"add stage {st}", stage_kernel(st), 6)

    # --- product width sweep, device-resident ---
    for S in (1, 2, 3, 4, 6):
        def mk(S=S):
            def kernel(x, y, z, n_ref, np_ref, b3_ref, ox, oy, oz):
                N_b, Np_b = n_ref[:], np_ref[:]
                NS = jnp.concatenate([N_b] * S, axis=-1)
                NpS = jnp.concatenate([Np_b] * S, axis=-1)
                outs = pk._stack_mul([(x[:], y[:])] * S, NS, NpS, TB)
                ox[:], oy[:], oz[:] = outs[0], y[:], z[:]

            return kernel

        t = bench(f"stack_mul width {S}", mk(), 3)
        print(f"    -> {t/S*1e3:6.3f} ms/product", flush=True)

    print(
        f"\nadd/double ratio: {results['add (prod)'] / results['double (prod)']:.2f}"
        f"  (target <= 2.2, op-count ~1.5)"
    )


if __name__ == "__main__":
    main()
