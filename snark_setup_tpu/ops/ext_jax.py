"""Extension-field ops on device (Fp2 / Fp3 towers over FpOps limb vectors).

Element layout (limbs-leading, batch-trailing — see fp_jax.py):
  Fp  : (L, *batch)
  Fp2 : (L, 2, *batch)
  Fp3 : (L, 3, *batch)
The coefficient axis sits between the limb axis and the batch axes, so plain
FpOps elementwise ops (add/sub/carry/select) apply unchanged — everything
after axis 0 is batch to them — while per-coefficient ops slice axis 1.

A uniform protocol (mul/add/sub/neg/sqr/inv/select/stack/...) lets the curve
group law (curve_jax.py) be generic over Fp, Fp2 and Fp3 coordinates — one
set of complete-formula kernels serves G1 and G2 of all five curves.

Compile/runtime design: multiplication goes through a *column-space* pipeline
(`prod_cols` -> merge -> `redc`): one stacked limb-product per mul round and
one Montgomery reduction per output coefficient, instead of 3-9 sequential
full Montgomery muls. Independent muls stack along a batch axis (`stack`),
keeping XLA graphs small and TPU ops large. Negative tower non-residues are
handled by negating one *input* (exact) so columns never go negative.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fp_jax import FpOps


class BaseFieldOps:
    """Degree-1 'extension': direct passthrough to FpOps; layout (L, *batch)."""

    degree = 1

    def __init__(self, fp: FpOps):
        self.fp = fp
        # max #plain-products accumulated per coefficient by prod_cols
        self.prod_nprod = 1

    def zeros(self, shape=()):
        return self.fp.zeros(shape)

    def ones(self, shape=()):
        return self.fp.ones(shape)

    def bc(self, c, like):
        """Broadcast-reshape a (L,) or (L, 1) constant against `like`."""
        c = np.asarray(c)
        return c.reshape(self.fp.L, *([1] * (like.ndim - 1)))

    def stack(self, elems):
        """Stack independent elements along a new first batch axis (axis 1)."""
        return jnp.stack(elems, axis=1)

    def unstack(self, arr, i):
        return arr[:, i]

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def prod_cols(self, a, b):
        """Column-space product: (2L, *batch) non-negative columns."""
        return self.fp.school_cols(a, b)

    def redc(self, cols, nprod: int = None):
        return self.fp.redc_cols(cols, nprod if nprod is not None else self.prod_nprod)

    def mul(self, a, b):
        return self.redc(self.prod_cols(a, b))

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k):
        return self.fp.mul_small(a, k)

    def inv(self, a):
        return self.fp.inv(a)

    def is_zero(self, a):
        return self.fp.is_zero(a)

    def eq(self, a, b):
        return self.fp.eq(a, b)

    def select(self, cond, a, b):
        return self.fp.select(cond, a, b)

    def from_coeffs(self, host_vals):
        """list of int tuples (or ints) -> (L, n) host numpy Montgomery."""
        vals = [v[0] if isinstance(v, (tuple, list)) else v for v in host_vals]
        return self.fp.from_int(vals)

    def to_coeffs(self, a):
        return [(v,) for v in self.fp.to_int(a)]

    def mul_stacked(self, U, V, weights: tuple, nprod: int):
        """G Montgomery products, each a weighted sum of S stacked products:
        out[:, g] = redc(sum_s weights[g][s] * cols(U_s * V_s)).

        U, V: (L, S, *batch). On a TPU backend this runs as the fully-fused
        u32 pallas kernel (ops/pallas_field.py: schoolbook + weighted merge
        + REDC per batch tile, nothing leaves VMEM) — the fastest measured
        config (benches/kernel_ab.py). Opt-in alternatives: the split
        product-kernel + XLA MXU-Toeplitz redc (SNARK_SETUP_MXU_STACKED=1)
        and the f32 byte-plane + in-kernel-MXU v2 (SNARK_SETUP_KERNEL_V2=1).
        Elsewhere it is the jnp column path."""
        from .pallas_field import (
            kernel_v2_enabled,
            kernel_v3_enabled,
            mxu_stacked_forced,
            pallas_enabled,
            pallas_mul_for,
        )

        if pallas_enabled() and U.ndim == 3:
            pm = pallas_mul_for(self.fp.modulus)
            if kernel_v2_enabled() and pm.v2_supported(weights):
                return pm.v2(U, V, weights)
            if kernel_v3_enabled():
                return pm.v3(U, V, weights)
            if mxu_stacked_forced():
                cols = pm.cols(U, V, weights)  # (2L, G, B)
                return self.fp.redc_cols_matmul(cols, nprod)
            # default: fully-fused u32 kernel — fastest measured config
            # (benches/kernel_ab.py: 44.6k vs 31.4k split vs 19.6k v2)
            return pm(U, V, weights)
        W = self.prod_cols(U, V)  # (2L, S, *batch)
        groups = []
        for g_w in weights:
            acc = None
            for s, w in enumerate(g_w):
                if w == 0:
                    continue
                term = W[:, s] if w == 1 else np.uint32(w) * W[:, s]
                acc = term if acc is None else acc + term
            groups.append(acc)
        return self.redc(jnp.stack(groups, axis=1), nprod)


class _ExtCommon:
    def zeros(self, shape=()):
        return self.fp.zeros((self.degree, *shape))

    def ones(self, shape=()):
        z = self.zeros(shape)
        z[:, 0] = self.fp.ones(shape)
        return z

    def bc(self, c, like):
        """Broadcast-reshape a (L, d) or (L, d, 1) constant against `like`."""
        c = np.asarray(c)
        return c.reshape(self.fp.L, self.degree, *([1] * (like.ndim - 2)))

    def stack(self, elems):
        """Stack independent elements along a new first batch axis (axis 2)."""
        return jnp.stack(elems, axis=2)

    def unstack(self, arr, i):
        return arr[:, :, i]

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def redc(self, cols, nprod: int = None):
        return self.fp.redc_cols(cols, nprod if nprod is not None else self.prod_nprod)

    def mul(self, a, b):
        return self.redc(self.prod_cols(a, b))

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k):
        return self.fp.mul_small(a, k)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def eq(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        return jnp.all(a == b, axis=(0, 1))

    def select(self, cond, a, b):
        return jnp.where(cond, a, b)

    def from_coeffs(self, host_vals):
        """list of d-tuples -> (L, d, n) host numpy Montgomery."""
        cs = [self.fp.from_int([v[i] for v in host_vals]) for i in range(self.degree)]
        return np.stack(cs, axis=1)

    def to_coeffs(self, a):
        arr = np.asarray(a)
        cs = [self.fp.to_int(arr[:, i]) for i in range(self.degree)]
        return list(zip(*cs))

    # tower expansion table: per output coefficient c, a list of
    # (a_coeff_idx, b_coeff_idx, weight, negate_a) base products — mirrors
    # prod_cols (QuadFieldOps/CubicFieldOps below)
    def _tower_products(self):
        nr = self.nr
        w = abs(nr)
        neg = nr < 0
        if self.degree == 2:
            return [
                [(0, 0, 1, False), (1, 1, w, neg)],  # c0 = a0b0 + nr a1b1
                [(0, 1, 1, False), (1, 0, 1, False)],  # c1 = a0b1 + a1b0
            ]
        return [
            [(0, 0, 1, False), (1, 2, w, neg), (2, 1, w, neg)],
            [(0, 1, 1, False), (1, 0, 1, False), (2, 2, w, neg)],
            [(0, 2, 1, False), (2, 0, 1, False), (1, 1, 1, False)],
        ]

    def mul_stacked(self, U, V, weights: tuple, nprod: int):
        """Ext-field twin of BaseFieldOps.mul_stacked: U, V (L, d, S, *batch).

        On TPU the tower products flatten into the SAME base-field pallas
        kernel: every output coefficient of every curve-level group is a
        weighted sum of base products, so the composite (curve ⊗ tower)
        weight matrix drives one fused kernel call (with the reduction on
        the MXU when enabled). Fallback: prod_cols handles the tower merge
        per stacked element, then the curve-level weighted merge runs over
        the S axis before one REDC."""
        from .pallas_field import mxu_redc_enabled, pallas_enabled, pallas_mul_for

        if pallas_enabled() and U.ndim == 4:
            d = self.degree
            tower = self._tower_products()
            S = U.shape[2]
            G = len(weights)
            rows_u, rows_v = [], []
            # base stack order: (s, t) with t enumerating the tower products
            prods = [(ai, bi, w, na) for c in tower for (ai, bi, w, na) in c]
            for s in range(S):
                for ai, bi, _w, na in prods:
                    au = U[:, ai, s]
                    rows_u.append(self.fp.neg(au) if na else au)
                    rows_v.append(V[:, bi, s])
            Ub = jnp.stack(rows_u, axis=1)  # (L, S*T, B)
            Vb = jnp.stack(rows_v, axis=1)
            T = len(prods)
            # composite weights: out (g, c) sums tower-product t of coeff c
            # across s with curve weight * tower weight
            t_of_c = []
            off = 0
            for c in range(d):
                idxs = []
                for k, _ in enumerate(tower[c]):
                    idxs.append((off + k, tower[c][k][2]))
                off += len(tower[c])
                t_of_c.append(idxs)
            comp = []
            for g_w in weights:
                for c in range(d):
                    row = [0] * (S * T)
                    for s, w in enumerate(g_w):
                        if w == 0:
                            continue
                        for t_idx, tw in t_of_c[c]:
                            row[s * T + t_idx] = w * tw
                    comp.append(tuple(row))
            from .pallas_field import (
                kernel_v2_enabled,
                kernel_v3_enabled,
                mxu_stacked_forced,
            )

            pm = pallas_mul_for(self.fp.modulus)
            if kernel_v2_enabled() and pm.v2_supported(tuple(comp)):
                out = pm.v2(Ub, Vb, tuple(comp))
            elif kernel_v3_enabled():
                # same dispatch order as BaseFieldOps.mul_stacked so
                # SNARK_SETUP_KERNEL_V3 covers both sites (ADVICE r3)
                out = pm.v3(Ub, Vb, tuple(comp))
            elif mxu_stacked_forced():
                cols = pm.cols(Ub, Vb, tuple(comp))  # (2L, G*d, B)
                out = self.fp.redc_cols_matmul(cols, nprod)
            else:
                out = pm(Ub, Vb, tuple(comp))
            # (L, G*d, B) with index g*d + c -> (L, d, G, B)
            B = out.shape[-1]
            L = out.shape[0]
            return jnp.transpose(out.reshape(L, G, d, B), (0, 2, 1, 3))

        W = self.prod_cols(U, V)  # (2L, d, S, *batch)
        groups = []
        for g_w in weights:
            acc = None
            for s, w in enumerate(g_w):
                if w == 0:
                    continue
                term = W[:, :, s] if w == 1 else np.uint32(w) * W[:, :, s]
                acc = term if acc is None else acc + term
            groups.append(acc)
        return self.redc(jnp.stack(groups, axis=2), nprod)


class QuadFieldOps(_ExtCommon):
    """Fp2 = Fp[u]/(u^2 - nr); layout (L, 2, *batch)."""

    degree = 2

    def __init__(self, fp: FpOps, nonresidue: int):
        self.fp = fp
        self.nr = nonresidue if nonresidue <= fp.modulus // 2 else nonresidue - fp.modulus
        self.prod_nprod = max(1 + abs(self.nr), 2)

    def prod_cols(self, a, b):
        """Schoolbook product as (2L, 2, *batch) non-negative columns — ONE
        stacked limb multiply (4 products), nr folded with |nr| weight and a
        pre-negated input when nr < 0."""
        fp = self.fp
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        nr = self.nr
        a1w = fp.neg(a1) if nr < 0 else a1
        U = jnp.stack([a0, a1w, a0, a1], axis=1)
        V = jnp.stack([b0, b1, b1, b0], axis=1)
        W = fp.school_cols(U, V)  # (2L, 4, *batch)
        c0 = W[:, 0] + np.uint32(abs(nr)) * W[:, 1]
        c1 = W[:, 2] + W[:, 3]
        return jnp.stack([c0, c1], axis=1)

    def inv(self, a):
        fp = self.fp
        a0, a1 = a[:, 0], a[:, 1]
        norm = fp.sub(fp.mont_sqr(a0), _nr_mul(fp, fp.mont_sqr(a1), self.nr))
        ninv = fp.inv(norm)
        return jnp.stack([fp.mont_mul(a0, ninv), fp.neg(fp.mont_mul(a1, ninv))], axis=1)


class CubicFieldOps(_ExtCommon):
    """Fp3 = Fp[u]/(u^3 - nr); layout (L, 3, *batch)."""

    degree = 3

    def __init__(self, fp: FpOps, nonresidue: int):
        self.fp = fp
        self.nr = nonresidue if nonresidue <= fp.modulus // 2 else nonresidue - fp.modulus
        self.prod_nprod = max(1 + 2 * abs(self.nr), 2 + abs(self.nr), 3)

    def prod_cols(self, a, b):
        """Schoolbook product as (2L, 3, *batch) non-negative columns — ONE
        stacked limb multiply (9 products).

        c0 = a0b0 + nr(a1b2 + a2b1)
        c1 = a0b1 + a1b0 + nr*a2b2
        c2 = a0b2 + a2b0 + a1b1
        """
        fp = self.fp
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1, a2 = (a[:, i] for i in range(3))
        b0, b1, b2 = (b[:, i] for i in range(3))
        nr = self.nr
        if nr < 0:
            a1w, a2w = fp.neg(a1), fp.neg(a2)
        else:
            a1w, a2w = a1, a2
        U = jnp.stack([a0, a1w, a2w, a0, a1, a2w, a0, a2, a1], axis=1)
        V = jnp.stack([b0, b2, b1, b1, b0, b2, b2, b0, b1], axis=1)
        W = fp.school_cols(U, V)  # (2L, 9, *batch)
        w = np.uint32(abs(nr))
        c0 = W[:, 0] + w * (W[:, 1] + W[:, 2])
        c1 = W[:, 3] + W[:, 4] + w * W[:, 5]
        c2 = W[:, 6] + W[:, 7] + W[:, 8]
        return jnp.stack([c0, c1, c2], axis=1)

    def inv(self, a):
        fp = self.fp
        a0, a1, a2 = (a[:, i] for i in range(3))
        nrm = lambda x: _nr_mul(fp, x, self.nr)
        t0 = fp.sub(fp.mont_sqr(a0), nrm(fp.mont_mul(a1, a2)))
        t1 = fp.sub(nrm(fp.mont_sqr(a2)), fp.mont_mul(a0, a1))
        t2 = fp.sub(fp.mont_sqr(a1), fp.mont_mul(a0, a2))
        norm = fp.add(
            fp.mont_mul(a0, t0),
            nrm(fp.add(fp.mont_mul(a2, t1), fp.mont_mul(a1, t2))),
        )
        ninv = fp.inv(norm)
        return jnp.stack(
            [fp.mont_mul(t0, ninv), fp.mont_mul(t1, ninv), fp.mont_mul(t2, ninv)],
            axis=1,
        )


def _nr_mul(fp: FpOps, a, nr: int):
    """Multiply by the (small, possibly negative) tower non-residue."""
    out = fp.mul_small(a, abs(nr))
    if nr < 0:
        out = fp.neg(out)
    return out


def make_field_ops(fp: FpOps, degree: int, nonresidue: int = 0):
    if degree == 1:
        return BaseFieldOps(fp)
    if degree == 2:
        return QuadFieldOps(fp, nonresidue)
    if degree == 3:
        return CubicFieldOps(fp, nonresidue)
    raise ValueError(degree)
