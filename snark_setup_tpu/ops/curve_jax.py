"""Batched elliptic-curve group law on device — complete projective formulas.

TPU-first choices:
- Limbs-leading layout (fp_jax.py): coordinates are (L[, d], B) with the
  batch axis LAST so it maps onto the 128-wide VPU lanes at full
  utilization; limb/coefficient axes are leading (cheap static slices).
- Renes–Costello–Batina *complete* addition formulas (eprint 2015/1060,
  Algorithm 1; a=0 fast path = Algorithm 7): branch-free, handle doubling
  and infinity uniformly — ideal for XLA/TPU where data-dependent control
  flow is poison. Infinity is (0 : 1 : 0). The formulas are restructured
  into THREE stacked multiplication rounds with column-space pair merges
  (see ext_jax.py) — ~10x smaller XLA graphs than sequential muls.
- Scalar multiplication is a `lax.scan` over scalar bits with constant-time
  selects (also good hygiene for a ceremony tool: no secret-dependent
  control flow), replacing the reference's per-element `mul_bigint` hot loop
  (batch_exp, setup-utils/src/helpers.rs:75-140).
- MSM is bucket-free tree reduction for now (Pippenger with psum-reduced
  buckets lands in the sharded path).

Coordinates are field elements of a `field_ops` (Fp, Fp2 or Fp3 limb
vectors), so the same code drives G1 and G2 on all five curves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.constants import CurveSpec, get_curve
from ..curves.host import AffinePoint, INFINITY, g1_curve, g2_curve
from ..fields.limb import LIMB_BITS
from .ext_jax import make_field_ops
from .fp_jax import FpOps, fp_ops


class PointVec(dict):
    """Batched projective points: {'x','y','z'} arrays, batch axis last."""

    @property
    def x(self):
        return self["x"]

    @property
    def y(self):
        return self["y"]

    @property
    def z(self):
        return self["z"]


jax.tree_util.register_pytree_node(
    PointVec,
    lambda p: ((p["x"], p["y"], p["z"]), None),
    lambda _, xs: PointVec(x=xs[0], y=xs[1], z=xs[2]),
)


class CurveOps:
    """Group-law kernels for one source group of one curve."""

    def __init__(self, spec: CurveSpec, group: str):
        self.spec = spec
        self.group_name = group
        gspec = spec.g1 if group == "g1" else spec.g2
        self.gspec = gspec
        self.fq = fp_ops(spec.q)
        degree = {"fp": 1, "fp2": 2, "fp3": 3}[gspec.field_kind]
        self.field = make_field_ops(self.fq, degree, spec.ext_nonresidue)
        self.host_curve = g1_curve(spec) if group == "g1" else g2_curve(spec)
        # device curve constants (Montgomery form, host numpy, trailing
        # singleton batch axis so they broadcast via field.bc)
        a_host = gspec.a if degree > 1 else (gspec.a[0],)
        b_host = gspec.b if degree > 1 else (gspec.b[0],)
        self.a_is_zero = all(v == 0 for v in a_host)
        self.a_dev = self.field.from_coeffs([tuple(a_host)])
        b3 = tuple(3 * v % spec.q for v in b_host)
        self.b3_dev = self.field.from_coeffs([b3])
        if not self.a_is_zero:
            # -(a^2) as a host constant (used by the complete-add formulas)
            from .hostmath import host_ext_pow

            nr = spec.ext_nonresidue if degree > 1 else 0
            a2 = host_ext_pow(tuple(a_host), 2, spec.q, degree, nr)
            neg_a2 = tuple((spec.q - c) % spec.q for c in a2)
            self.neg_a2_dev = self.field.from_coeffs([neg_a2])
        # |3b| as a small integer where the curve allows it (G1 of the
        # BLS/BW6 curves has b in {1, -1, 4}): lets doubling fold the
        # 3b*Z^2 product into round 0 as a column weight, dropping one
        # multiplication round entirely. (|w|, negate) or None.
        self._b3_small = None
        if self.a_is_zero and degree == 1:
            b3i = 3 * b_host[0] % spec.q
            if b3i <= 1 << 10:
                self._b3_small = (b3i, False)
            elif spec.q - b3i <= 1 << 10:
                self._b3_small = (spec.q - b3i, True)
        # scalar field
        self.fr = fp_ops(spec.r)
        self.scalar_bits = spec.r.bit_length()
        # GLV endomorphism (j=0 curves): device decomposition + host consts
        from .glv import GLVOps, derive_glv

        self.glv = None
        params = derive_glv(spec.name, group)
        if params is not None:
            self.glv = GLVOps(params, self.fr.L)
            # beta as an Fq Montgomery constant; multiplying every coordinate
            # limb plane by it applies phi regardless of extension degree
            # (beta is in the base field, so (a0 + a1 u + ...) * beta is
            # coefficient-wise)
            self._glv_beta = self.fq.from_int(params.beta)[:, None]
            e = params.endo_check_lambda
            if e is not None:
                from ..fields.limb import int_to_limbs

                nl = -(-abs(e).bit_length() // LIMB_BITS)
                self._endo_check = (
                    int_to_limbs(abs(e), nl)[:, None],
                    abs(e).bit_length(),
                    e < 0,
                )
            else:
                self._endo_check = None

    # -- constructors ------------------------------------------------------
    def infinity(self, shape=()) -> PointVec:
        return PointVec(
            x=self.field.zeros(shape),
            y=self.field.ones(shape),
            z=self.field.zeros(shape),
        )

    def from_affine_host(self, points: list[AffinePoint]) -> PointVec:
        """Host affine points -> projective batch (host numpy arrays)."""
        deg = self.field.degree

        def coords(p):
            if p.is_infinity:
                return (0,) * deg, (1,) * 1 + (0,) * (deg - 1), True
            if deg == 1:
                return (p.x.v,), (p.y.v,), False
            return (
                tuple(c.v for c in p.x.coeffs),
                tuple(c.v for c in p.y.coeffs),
                False,
            )

        xs, ys, infs = [], [], []
        for p in points:
            cx, cy, inf = coords(p)
            xs.append(cx)
            ys.append(cy)
            infs.append(inf)
        x = self.field.from_coeffs(xs)  # (L[, d], B) host numpy Montgomery
        y = self.field.from_coeffs(ys)
        inf_mask = np.array(infs, bool)  # (B,) broadcasts from the right
        one = np.broadcast_to(
            self.field.ones().reshape(*x.shape[:-1], 1), x.shape
        )
        zero = np.zeros_like(x)
        z = np.where(inf_mask, zero, one)
        x = np.where(inf_mask, zero, x)
        y = np.where(inf_mask, one, y)
        return PointVec(x=x, y=y, z=z)

    # Widest batch any single normalize/readback graph may span: the
    # batch-inversion graph returns wrong limbs for EVERY lane above
    # ~12288 lanes on v5e (measured round 4 — see
    # codec_jax.BatchPointCodec.MAX_DEVICE_BATCH for the full boundary
    # data). Wider inputs are sliced host-side.
    MAX_NORMALIZE_LANES = 1 << 13

    def to_affine_host(self, p: PointVec) -> list[AffinePoint]:
        """Device batch -> host affine points (batch-inverts Z); the whole
        device part (normalize + Montgomery conversion) is one jitted call
        per <= MAX_NORMALIZE_LANES slice."""
        B = int(p["x"].shape[-1])
        M = self.MAX_NORMALIZE_LANES
        if B > M:
            out = []
            for lo in range(0, B, M):
                sl = PointVec({k: v[..., lo : lo + M] for k, v in p.items()})
                out.extend(self.to_affine_host(sl))
            return out
        if not hasattr(self, "_toaff_jit"):

            def f(pt):
                x, y, inf = self.normalize(pt)
                return self.fq.from_mont(x), self.fq.from_mont(y), inf

            self._toaff_jit = jax.jit(f)
        x_std, y_std, inf = self._toaff_jit(p)
        coeffs_x = self._std_to_coeffs(x_std)
        coeffs_y = self._std_to_coeffs(y_std)
        infs = np.asarray(inf).reshape(-1)
        out = []
        for cx, cy, isinf in zip(coeffs_x, coeffs_y, infs):
            if isinf:
                out.append(INFINITY)
                continue
            if self.field.degree == 1:
                out.append(AffinePoint(self.spec.fp(cx[0]), self.spec.fp(cy[0])))
            else:
                out.append(
                    AffinePoint(self.spec.g2_field(cx), self.spec.g2_field(cy))
                )
        return out

    def _std_to_coeffs(self, arr):
        """Standard-form limb planes (L[, d], B) -> list of int tuples."""
        from ..fields.limb import limbs_batch_to_ints

        a = np.asarray(arr)
        deg = self.field.degree
        L = a.shape[0]
        if deg == 1:
            flat = a.reshape(L, -1).T
            return [(v,) for v in limbs_batch_to_ints(flat)]
        # (L, d, B) -> (B, d, L) rows (point-major)
        flat = a.reshape(L, deg, -1).transpose(2, 1, 0).reshape(-1, L)
        ints = limbs_batch_to_ints(flat)
        return [tuple(ints[i * deg : (i + 1) * deg]) for i in range(len(ints) // deg)]

    # -- group law ---------------------------------------------------------
    def _group_fused(self):
        """The fused single-launch group-op kernels (pallas_group.py) when
        enabled and applicable (degree-1 coords, a=0, pallas backend) —
        they keep ALL field glue in VMEM instead of streaming (L, B) planes
        through HBM between stacked-mul launches."""
        if not (self.a_is_zero and self.field.degree == 1):
            return None
        from .pallas_field import pallas_enabled
        from .pallas_group import group_fused_enabled, group_ops_for

        if not (pallas_enabled() and group_fused_enabled()):
            return None
        return group_ops_for(self.spec.name, self.group_name)

    def add(self, p: PointVec, q: PointVec) -> PointVec:
        """RCB complete addition in three stacked multiplication rounds.
        Every round is one F.mul_stacked call (stacked products + weighted
        column merge + single REDC) — on TPU a fused pallas kernel."""
        g = self._group_fused()
        if g is not None:
            return g.add(p, q)
        F = self.field
        X1, Y1, Z1 = p["x"], p["y"], p["z"]
        X2, Y2, Z2 = q["x"], q["y"], q["z"]
        b3 = F.bc(self.b3_dev, X1)

        # round 0: the six symmetric products
        U = F.stack([X1, Y1, Z1, F.add(X1, Y1), F.add(X1, Z1), F.add(Y1, Z1)])
        V = F.stack([X2, Y2, Z2, F.add(X2, Y2), F.add(X2, Z2), F.add(Y2, Z2)])
        W = F.mul_stacked(U, V, _ID6, F.prod_nprod)
        t0, t1, t2, s3, s4, s5 = (F.unstack(W, i) for i in range(6))
        t3 = F.sub(s3, F.add(t0, t1))  # X1Y2 + X2Y1
        t4 = F.sub(s4, F.add(t0, t2))  # X1Z2 + X2Z1
        t5 = F.sub(s5, F.add(t1, t2))  # Y1Z2 + Y2Z1

        if self.a_is_zero:
            # round 1: constant products with 3b
            st = F.stack([t2, t4])
            m = F.mul_stacked(
                jnp.broadcast_to(F.bc(self.b3_dev, st), st.shape), st, _ID2, F.prod_nprod
            )
            Z3_, t4b = F.unstack(m, 0), F.unstack(m, 1)
            t1n = F.add(F.add(t0, t0), t0)  # 3 X1X2
        else:
            # round 1: constant products, 3-group weighted merge
            a_c = F.bc(self.a_dev, X1)
            na2 = F.bc(self.neg_a2_dev, X1)
            bc = lambda c: jnp.broadcast_to(c, X1.shape)
            consts = F.stack([bc(a_c), bc(b3), bc(b3), bc(a_c), bc(na2), bc(a_c)])
            opnds = F.stack([t4, t2, t4, t0, t2, t2])
            mr = F.mul_stacked(
                consts,
                opnds,
                ((1, 1, 0, 0, 0, 0), (0, 0, 1, 1, 1, 0), (0, 0, 0, 0, 0, 1)),
                3 * F.prod_nprod,
            )
            Z3_ = F.unstack(mr, 0)  # a t4 + 3b Z1Z2
            t4b = F.unstack(mr, 1)  # 3b t4 + a(X1X2 - a Z1Z2)
            at2 = F.unstack(mr, 2)
            t1n = F.add(F.add(F.add(t0, t0), t0), at2)  # 3X1X2 + a Z1Z2
        X3_ = F.sub(t1, Z3_)
        Z3p = F.add(t1, Z3_)

        # round 2: six products merged pairwise
        t5n = F.neg(t5)
        A = F.stack([X3_, t1n, t3, t5n, t5, t3])
        Bv = F.stack([Z3p, t4b, X3_, t4b, Z3p, t1n])
        R = F.mul_stacked(
            A,
            Bv,
            ((1, 1, 0, 0, 0, 0), (0, 0, 1, 1, 0, 0), (0, 0, 0, 0, 1, 1)),
            2 * F.prod_nprod,
        )
        return PointVec(x=F.unstack(R, 1), y=F.unstack(R, 0), z=F.unstack(R, 2))

    def double(self, p: PointVec) -> PointVec:
        """Complete doubling. For a=0 curves uses the dedicated RCB
        doubling (eprint 2015/1060 Algorithm 9): 9 field muls in three
        stacked rounds vs the 14 of the complete add — the dominant cost of
        scalar multiplication. a != 0 falls back to add(p, p)."""
        if not self.a_is_zero:
            return self.add(p, p)
        g = self._group_fused()
        if g is not None:
            return g.double(p)
        F = self.field
        X, Y, Z = p["x"], p["y"], p["z"]

        if self._b3_small is not None:
            # fold c = 3b*Z^2 into round 0 — as a column WEIGHT on the Z*Z
            # stack when w*N < R (the REDC bound), else by pre-scaling one
            # operand. Either way the dedicated 3b round below disappears:
            # 8 products/REDCs and 2 launches per doubling instead of 9/3.
            w, negate = self._b3_small
            if w * self.spec.q < self.fq.spec.mont_r_pow:
                U = F.stack([Y, Y, X, Z])
                V = F.stack([Y, Z, Y, Z])
                wts = ((1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, w))
                W = F.mul_stacked(U, V, wts, w * F.prod_nprod)
            else:
                wZ = F.mul_small(Z, w)
                U = F.stack([Y, Y, X, Z])
                V = F.stack([Y, Z, Y, wZ])
                W = F.mul_stacked(U, V, _ID4, F.prod_nprod)
            t0, t1, m3, c = (F.unstack(W, i) for i in range(4))
            if negate:
                c = F.neg(c)
            z3a = F.mul_small(t0, 8)
        else:
            b3 = F.bc(self.b3_dev, X)
            # round 0: t0=Y^2, t1=YZ, m3=XY, t2=Z^2
            U = F.stack([Y, Y, X, Z])
            V = F.stack([Y, Z, Y, Z])
            W = F.mul_stacked(U, V, _ID4, F.prod_nprod)
            t0, t1, m3, t2 = (F.unstack(W, i) for i in range(4))
            z3a = F.mul_small(t0, 8)

            # round 1: c = 3b * Z^2
            c = F.unstack(
                F.mul_stacked(
                    F.stack([jnp.broadcast_to(b3, t2.shape)]),
                    F.stack([t2]),
                    ((1,),),
                    F.prod_nprod,
                ),
                0,
            )

        t0p = F.sub(t0, F.mul_small(c, 3))
        y3sum = F.add(t0, c)

        # round 2: X3=c*z3a, Z3=t1*z3a, Y3a=t0p*y3sum, X3b=t0p*m3
        U2 = F.stack([c, t1, t0p, t0p])
        V2 = F.stack([z3a, z3a, y3sum, m3])
        W2 = F.mul_stacked(U2, V2, _ID4, F.prod_nprod)
        x3, z3, y3a, x3b = (F.unstack(W2, i) for i in range(4))
        return PointVec(
            x=F.add(x3b, x3b),
            y=F.add(x3, y3a),
            z=z3,
        )

    def neg(self, p: PointVec) -> PointVec:
        return PointVec(x=p["x"], y=self.field.neg(p["y"]), z=p["z"])

    def select(self, cond, p: PointVec, q: PointVec) -> PointVec:
        F = self.field
        return PointVec(
            x=F.select(cond, p["x"], q["x"]),
            y=F.select(cond, p["y"], q["y"]),
            z=F.select(cond, p["z"], q["z"]),
        )

    def is_infinity(self, p: PointVec):
        return self.field.is_zero(p["z"])

    # -- scalar multiplication --------------------------------------------
    def scalar_bits_msb(self, scalars_raw: jnp.ndarray) -> jnp.ndarray:
        """(Ls, B) raw 16-bit limb scalars -> (nbits, B) bit planes,
        MSB first."""
        Ls, B = scalars_raw.shape
        shifts = np.arange(LIMB_BITS, dtype=np.uint32)[None, :, None]
        bits = (scalars_raw[:, None, :] >> shifts) & np.uint32(1)  # (Ls,16,B)
        bits = bits.reshape(Ls * LIMB_BITS, B)  # LSB first
        bits = bits[: self.scalar_bits]
        return jnp.flip(bits, axis=0).astype(bool)

    def scalar_mul_binary(self, p: PointVec, scalars_raw: jnp.ndarray) -> PointVec:
        """Batched double-and-add over scalar bits (constant-time selects).
        Kept as the simple oracle for the windowed kernel below.

        scalars_raw: (Ls, B) batch of Fr values as raw 16-bit limb planes
        in standard (non-Montgomery) form.
        """
        bits = self.scalar_bits_msb(scalars_raw)
        acc0 = self.infinity((scalars_raw.shape[-1],))

        def step(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            return self.select(bit, added, acc), None

        acc, _ = jax.lax.scan(step, acc0, bits)
        return acc

    WINDOW = 4

    def scalar_digits_msb(
        self, scalars_raw: jnp.ndarray, w: int, nbits: int | None = None
    ) -> jnp.ndarray:
        """(Ls, B) raw 16-bit limb scalars -> (nwin, B) w-bit digits, MSB
        first (w must divide LIMB_BITS). `nbits` bounds the scalar width
        (defaults to the full scalar-field width)."""
        assert LIMB_BITS % w == 0
        Ls, B = scalars_raw.shape
        per = LIMB_BITS // w
        shifts = (w * np.arange(per, dtype=np.uint32))[None, :, None]
        digs = (scalars_raw[:, None, :] >> shifts) & np.uint32((1 << w) - 1)
        digs = digs.reshape(Ls * per, B)  # LSB-first digit order
        nwin = -(-(nbits if nbits is not None else self.scalar_bits) // w)
        digs = digs[:nwin]
        return jnp.flip(digs, axis=0)

    # -- window table helpers (limbs-leading stacked layout) ----------------
    def _window_table(self, p: PointVec) -> dict:
        """Stacked multiples table T[j] = j*P for j in [0, 2^w): coords
        (L[, d], 2^w, B). Entries 3..2^w-1 are built with a lax.scan (one
        traced group-add instead of 13) — the table build dominated trace
        time when unrolled, and XLA can't deduplicate repeated subgraphs."""
        B = p["x"].shape[-1]
        inf = self.infinity((B,))
        d2 = self.double(p)

        def step(prev, _):
            nxt = self.add(prev, p)
            return nxt, nxt

        _, rest = jax.lax.scan(step, d2, None, length=(1 << self.WINDOW) - 3)

        full = jnp.broadcast_to(p["x"], inf["x"].shape).shape

        def stacked(k):
            head = jnp.stack(
                [inf[k], jnp.broadcast_to(p[k], full), d2[k]], axis=-2
            )  # (L[, d], 3, B)
            tail = jnp.moveaxis(rest[k], 0, -2)  # (L[, d], 2^w-3, B)
            return jnp.concatenate([head, tail], axis=-2)

        return {k: stacked(k) for k in ("x", "y", "z")}

    def _select_entry(self, table_arr: dict, digit: jnp.ndarray) -> PointVec:
        """Constant-time table lookup as a one-hot contraction over the
        2^w table rows (axis -2): one einsum per coordinate instead of 2^w
        masked selects — exact in uint32 (limbs < 2^16, single hot row)."""
        oh = (
            digit[None, :] == np.arange(1 << self.WINDOW, dtype=np.uint32)[:, None]
        ).astype(jnp.uint32)
        out = {}
        for k, arr in table_arr.items():
            out[k] = jnp.einsum("...jb,jb->...b", arr, oh)
        return PointVec(out)

    def _window_doubles(self, acc: PointVec, w: int) -> PointVec:
        """w successive doublings via fori_loop (one traced double)."""
        return jax.lax.fori_loop(0, w, lambda _, a: self.double(a), acc)

    def scalar_mul_windowed(
        self, p: PointVec, scalars_raw: jnp.ndarray, nbits: int | None = None
    ) -> PointVec:
        """Batched fixed-window scalar multiplication (w=4) over the RAW
        integer value of the scalars (no mod-r or subgroup assumptions —
        this is the ladder the Direct subgroup check must use).

        Per batch element: a 16-entry multiples table (1 double + 13 adds),
        then ceil(bits/4) windows of 4 doublings + one constant-time
        masked-sum table select + one complete add. vs binary double-and-add
        this trades 253 adds for ~77, and every doubling uses the cheap
        dedicated a=0 formula where available.
        """
        w = self.WINDOW
        digits = self.scalar_digits_msb(scalars_raw, w, nbits)
        B = scalars_raw.shape[-1]
        table_arr = self._window_table(p)
        acc0 = self.infinity((B,))

        def step(acc, digit):
            acc = self._window_doubles(acc, w)
            return self.add(acc, self._select_entry(table_arr, digit)), None

        acc, _ = jax.lax.scan(step, acc0, digits)
        return acc

    def _fq_mul_planes(self, arr: jnp.ndarray, const_col: np.ndarray) -> jnp.ndarray:
        """Multiply every (extension-coefficient x stack) plane of
        `arr` (L, *mid, B) by a base-field constant, through the fused
        stacked-mul kernel (pallas on TPU backends)."""
        L = arr.shape[0]
        mid = arr.shape[1:-1]
        B = arr.shape[-1]
        S = 1
        for m in mid:
            S *= m
        if S == 0:
            return arr
        from .ext_jax import make_field_ops

        fq_stack = make_field_ops(self.fq, 1, 0)
        U = arr.reshape(L, S, B)
        V = jnp.broadcast_to(const_col.reshape(L, 1, 1), U.shape)
        W = fq_stack.mul_stacked(U, V, _identity_weights(S), 1)
        return W.reshape(arr.shape)

    def endo(self, p: PointVec) -> PointVec:
        """Cube-root endomorphism phi(x, y) = (beta*x, y) on projective
        coordinates (j=0 curves only). beta is in Fq, so the multiply is
        coefficient-wise even on extension-field coordinates."""
        assert self.glv is not None
        return PointVec(
            x=self._fq_mul_planes(p["x"], self._glv_beta), y=p["y"], z=p["z"]
        )

    def eq_projective(self, p: PointVec, q: PointVec) -> jnp.ndarray:
        """Projective equality mask: cross-multiplied coordinate match.
        Infinity (Z=0) equals only infinity."""
        F = self.field
        U = F.stack([p["x"], p["y"]])
        V = F.stack([jnp.broadcast_to(q["z"], p["x"].shape)] * 2)
        U2 = F.stack([q["x"], q["y"]])
        V2 = F.stack([jnp.broadcast_to(p["z"], p["x"].shape)] * 2)
        A = F.mul_stacked(U, V, _ID2, F.prod_nprod)
        Bm = F.mul_stacked(U2, V2, _ID2, F.prod_nprod)
        both_inf = self.is_infinity(p) & self.is_infinity(q)
        coords_eq = F.eq(F.unstack(A, 0), F.unstack(Bm, 0)) & F.eq(
            F.unstack(A, 1), F.unstack(Bm, 1)
        )
        return coords_eq | both_inf

    def scalar_mul(self, p: PointVec, scalars_raw: jnp.ndarray) -> PointVec:
        """Batched scalar multiplication with the GLV fast path where the
        curve has the cube-root endomorphism (all BLS12/BW6 groups).

        GLV semantics: computes [k mod r]P assuming P lies in the order-r
        subgroup (where phi acts as [lambda]) — exactly the ceremony
        contract for batch_exp/MSM. Callers needing the raw integer ladder
        on arbitrary curve points (the Direct subgroup check multiplies by
        the group order itself!) must call scalar_mul_windowed.
        """
        if self.glv is None:
            return self.scalar_mul_windowed(p, scalars_raw)
        return self._scalar_mul_glv(p, scalars_raw)

    def _scalar_mul_glv(self, p: PointVec, scalars_raw: jnp.ndarray) -> PointVec:
        """k*P = k1*(s1 P) + k2*(s2 phi(P)) with half-width k1, k2 from the
        on-device lattice decomposition: ~half the doublings of the
        full-width ladder. The phi table is derived from the P table with
        one fused coefficient-wise Fq multiply (phi is a homomorphism, so
        phi(j * s1 P) = j * s1 phi(P); a conditional y-negation fixes the
        sign where s1 != s2)."""
        import os

        w = self.WINDOW
        nbits = self.glv.p.nbits

        from .pallas_field import pallas_enabled

        flag = os.environ.get("SNARK_SETUP_FUSED_LADDER", "auto")
        if (
            pallas_enabled()
            and self.field.degree == 1
            and flag not in ("0", "off", "false")
        ):
            # whole-ladder fused kernel: table + accumulator stay in VMEM
            # for all windows (pallas_ladder.py). DEFAULT on TPU since the
            # 2026-08-22 tile fix: at TILE_B=128 it measured 78-81k exp/s
            # vs 72-75k for the multi-kernel group-op path in every paired
            # bench.py A/B (the old 15-32k numbers came from TILE_B
            # 256/512, where the 6-wide stacked add rounds spill). The
            # decomposition + digit recode also runs as one pallas kernel
            # (pallas_glv.py): ~28 ms of XLA product-table data movement
            # gone, and the decompose graph with the measured 32k-lane
            # silent miscompile leaves the hot path entirely.
            from .pallas_glv import glv_digits_for
            from .pallas_ladder import fused_ladder_for

            dig = glv_digits_for(self.spec.name, self.group_name)
            d1, d2, neg1, flip = dig(scalars_raw)
            lad = fused_ladder_for(self.spec.name, self.group_name)
            return lad(p, d1, d2, neg1, flip)

        m1, neg1, m2, neg2 = self.glv.decompose(scalars_raw)
        d1 = self.scalar_digits_msb(m1, w, nbits)
        d2 = self.scalar_digits_msb(m2, w, nbits)
        B = scalars_raw.shape[-1]

        F = self.field
        base = self.select(neg1, self.neg(p), p)
        t1 = self._window_table(base)
        flip = neg1 != neg2
        t2 = {
            "x": self._fq_mul_planes(t1["x"], self._glv_beta),
            "y": F.select(flip, F.neg(t1["y"]), t1["y"]),
            "z": t1["z"],
        }

        digits = jnp.stack([d1, d2], axis=1)  # (nwin, 2, B)
        acc0 = self.infinity((B,))

        def step(acc, dd):
            acc = self._window_doubles(acc, w)
            acc = self.add(acc, self._select_entry(t1, dd[0]))
            acc = self.add(acc, self._select_entry(t2, dd[1]))
            return acc, None

        acc, _ = jax.lax.scan(step, acc0, digits)
        return acc

    # -- normalization -----------------------------------------------------
    def normalize(self, p: PointVec):
        """Projective -> affine using one batched inversion over the
        (flattened) batch axes. Returns (x, y, infinity_mask)."""
        F = self.field
        z = p["z"]
        # flatten trailing batch to one axis
        el_ndim = 1 if F.degree == 1 else 2
        zf = z.reshape(*z.shape[:el_ndim], -1)
        inv_z = _generic_batch_inv(F, zf)
        inv_z = inv_z.reshape(z.shape)
        x = F.mul(p["x"], inv_z)
        y = F.mul(p["y"], inv_z)
        return x, y, self.is_infinity(p)

    # -- reductions --------------------------------------------------------
    def sum_reduce(self, p: PointVec) -> PointVec:
        """Tree-reduce a batch of points (last axis) to a single point."""
        n = p["x"].shape[-1]
        while n > 1:
            half = n // 2
            even = jax.tree_util.tree_map(lambda a: a[..., 0 : 2 * half : 2], p)
            odd = jax.tree_util.tree_map(lambda a: a[..., 1 : 2 * half : 2], p)
            merged = self.add(PointVec(even), PointVec(odd))
            if n % 2:
                tail = jax.tree_util.tree_map(lambda a: a[..., -1:], p)
                merged = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], -1), merged, PointVec(tail)
                )
            p = PointVec(merged)
            n = half + (n % 2)
        return p

    def msm(self, p: PointVec, scalars_raw: jnp.ndarray) -> PointVec:
        """Multi-scalar multiplication: batched scalar-mul + tree reduction.

        Replaces msm_bigint inside merge_pairs (helpers.rs:371-384)."""
        prods = self.scalar_mul(p, scalars_raw)
        return self.sum_reduce(prods)


def _identity_weights(n: int) -> tuple:
    return tuple(tuple(1 if i == j else 0 for j in range(n)) for i in range(n))


_ID2 = _identity_weights(2)
_ID4 = _identity_weights(4)
_ID6 = _identity_weights(6)


def _generic_batch_inv(F, a):
    """Montgomery-trick batch inversion at the extension-field level over the
    LAST axis: prefix/suffix products via associative scans + one Fermat
    inversion."""
    is_zero = F.is_zero(a)
    n = a.shape[-1]
    safe = F.select(is_zero, F.ones((n,)), a)

    def combine(x, y):
        return F.mul(x, y)

    ax = safe.ndim - 1
    pre = jax.lax.associative_scan(combine, safe, axis=ax)
    suf = jax.lax.associative_scan(combine, safe, axis=ax, reverse=True)
    inv_total = F.inv(pre[..., -1:])
    ones1 = np.asarray(F.ones((1,)))
    pre_excl = jnp.concatenate([jnp.broadcast_to(ones1, pre[..., :1].shape), pre[..., :-1]], axis=-1)
    suf_excl = jnp.concatenate([suf[..., 1:], jnp.broadcast_to(ones1, suf[..., :1].shape)], axis=-1)
    out = F.mul(F.mul(pre_excl, suf_excl), jnp.broadcast_to(inv_total, a.shape))
    return F.select(is_zero, F.zeros((n,)), out)


@functools.lru_cache(maxsize=None)
def curve_ops(curve_name: str, group: str) -> CurveOps:
    return CurveOps(get_curve(curve_name), group)
