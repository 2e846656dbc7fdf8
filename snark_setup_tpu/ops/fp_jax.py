"""Vectorized multi-limb Montgomery field arithmetic in JAX (uint32 lanes).

TPU-first design (see /opt/skills/guides/pallas_guide.md):

- Field elements are little-endian vectors of 16-bit limbs stored in uint32
  lanes, **limbs-leading layout**: shape (L, *batch). The batch axes are the
  trailing (minor) dims, so XLA tiles them onto the 128-wide VPU lanes at
  full utilization; limb-axis manipulations (carry shifts, column sums) are
  cheap static slices over the leading axis. The TPU has no 64-bit integer
  multiply; a 16x16 product fits exactly in a uint32 lane.
- Products use a *column-space* ("lazy reduction") pipeline: `school_cols`
  produces 2L anti-diagonal column sums (< 2^23, no carries resolved) via a
  gather-free pad/reshape diagonal-sum trick; several products accumulate per
  column before ONE Montgomery reduction (`redc_cols`). Montgomery reduction
  is the fully-parallel two-multiplication REDC (m = t_low * N' mod R;
  t' = (t + m*N) / R) — no cross-limb sequential dependency.
- Carry resolution is a Kogge-Stone carry-lookahead over the limb axis
  (log-depth, fully vectorized).
- All loops over limbs are static; batch axes are trailing dims, so the same
  code paths shard over device meshes along the batch axes unchanged.
- All closure constants are HOST numpy arrays: jitted functions embed them
  as MLIR constants. (Eager jnp constants would live on the default device —
  with the tunneled axon TPU backend, lowering then stalls fetching each one
  back across the tunnel.)

Replaces the arithmetic underneath reference components C5-C7 (batch_exp,
generate_powers_of_tau; setup-utils/src/helpers.rs:32-140).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limb import LIMB_BITS, LIMB_MASK, LimbSpec, int_to_limbs

MASK = np.uint32(LIMB_MASK)
SHIFT = LIMB_BITS


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift limbs towards higher indices by d (zero-fill), axis 0."""
    if d == 0:
        return x
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _ks_carry(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Binary carry resolution for limbs v < 2^17 via Kogge-Stone
    carry-lookahead (log-depth, fully vectorized — no sequential scan).
    Returns (limbs < 2^16, carry-out-of-top-limb)."""
    L = v.shape[0]
    g = (v >> SHIFT).astype(bool)  # generate (carry out), v < 2^17 => 0/1
    p = (v & MASK) == MASK  # propagate
    d = 1
    while d < L:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    carry_in = _shift_up(g, 1)
    out = (v + carry_in.astype(jnp.uint32)) & MASK
    # carry out of the top limb: top generate bit
    top_carry = g[-1]
    return out, top_carry


def _resolve_carries(cols: jnp.ndarray) -> jnp.ndarray:
    """Propagate carries along axis 0. Input limbs < 2^31; output limbs
    < 2^16 with the final carry dropped (callers guarantee the value fits).
    One redundant round brings limbs under 2^17, then a log-depth
    carry-lookahead finishes — no data-dependent loops."""
    v = (cols & MASK) + _shift_up(cols >> SHIFT, 1)  # limbs < 2^16 + 2^15
    out, _ = _ks_carry(v)
    return out


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise (axis 0); returns (diff limbs, final borrow mask).
    Two's-complement addition in base 2^16 with carry-lookahead."""
    w = a + (MASK - b)  # < 2^17
    w = w.at[0].add(1)
    out, top_carry = _ks_carry(w)
    return out, ~top_carry


def _diag_cols(p: jnp.ndarray) -> jnp.ndarray:
    """Anti-diagonal sums of a (L, L, *batch) product table: returns
    (2L-1, *batch) with out[k] = sum_{i+j=k} p[i, j] — gather-free.

    Trick: flat index i*2L + j equals i*(2L-1) + (i+j); padding rows to
    width 2L, flattening, padding L-1 and reshaping to (L+1, 2L-1) aligns
    every anti-diagonal k into column k. Pure pad/reshape/sum — compiles to
    dense vector ops on TPU (no gather)."""
    L = p.shape[0]
    rest = p.shape[2:]
    pp = jnp.pad(p, [(0, 0), (0, L), *[(0, 0)] * len(rest)])  # (L, 2L, ...)
    flat = pp.reshape(2 * L * L, *rest)
    flat = jnp.pad(flat, [(0, L - 1), *[(0, 0)] * len(rest)])
    return flat.reshape(L + 1, 2 * L - 1, *rest).sum(axis=0)


class FpOps:
    """Montgomery field ops for one modulus, vectorized over trailing axes.

    Elements are uint32 arrays (L, *batch) in Montgomery form (R = 2^(16 L)).
    """

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.spec = LimbSpec(modulus)
        L = self.spec.n_limbs
        self.L = L
        # host numpy constants, (L, 1)-shaped so they broadcast against
        # (L, *batch) from the left limb axis
        self.N = int_to_limbs(modulus, L)[:, None]
        self.Nprime = int_to_limbs(self.spec.n0_inv, L)[:, None]
        self.one_mont_np = int_to_limbs(self.spec.mont_r % modulus, L)[:, None]

    # -- constants (host numpy; fold into jitted graphs as constants) ------
    def zeros(self, shape=()) -> np.ndarray:
        return np.zeros((self.L, *shape), np.uint32)

    def ones(self, shape=()) -> np.ndarray:
        return np.broadcast_to(self.one_mont_np.reshape(self.L, *([1] * len(shape))), (self.L, *shape))

    def bcast_const(self, c: np.ndarray, batch_ndim: int) -> np.ndarray:
        """Reshape an (L, 1) host constant for an (L, *batch) operand."""
        return c.reshape(self.L, *([1] * batch_ndim)) if batch_ndim != 1 else c

    # -- host conversion (pure host math — no device round trips) ----------
    def from_int(self, values, shape=None) -> np.ndarray:
        """Host ints (standard form) -> Montgomery limbs (L, n) host numpy.
        A single int gives shape (L,)."""
        from ..fields.limb import ints_to_limbs_batch

        single = isinstance(values, int)
        if single:
            values = [values]
        R = self.spec.mont_r
        m = self.modulus
        arr = ints_to_limbs_batch([(v % m) * R % m for v in values], self.L).T
        return arr[:, 0] if single else np.ascontiguousarray(arr)

    def to_int(self, limbs) -> list[int]:
        """Montgomery limbs (L, n) (host or device) -> host ints."""
        from ..fields.limb import limbs_batch_to_ints

        rinv = pow(self.spec.mont_r, -1, self.modulus)
        arr = np.asarray(limbs)
        if arr.ndim == 1:
            arr = arr[:, None]
        flat = arr.reshape(self.L, -1).T
        return [v * rinv % self.modulus for v in limbs_batch_to_ints(flat)]

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = np.zeros((self.L, *([1] * (a.ndim - 1))), np.uint32)
        one[0] = 1
        return self.mont_mul(a, one)

    def to_mont_raw(self, a: jnp.ndarray) -> jnp.ndarray:
        """Standard-form limbs -> Montgomery form (device)."""
        r2 = int_to_limbs(self.spec.mont_r2, self.L).reshape(
            self.L, *([1] * (a.ndim - 1))
        )
        return self.mont_mul(a, r2)

    # -- core arithmetic ---------------------------------------------------
    # Column-space ("lazy reduction") layer: a full product is kept as 2L-1
    # anti-diagonal column sums (each < 2L * 2^16 <= 2^23) WITHOUT carry
    # resolution. Independent products stack along a NEW LEADING-batch axis
    # (i.e. an extra trailing axis here? no: an extra *batch* axis) and
    # several products can be accumulated per column (headroom to 2^31)
    # before ONE Montgomery reduction. Subtraction never appears in column
    # space: callers negate one *input* element instead (exact, cheap).
    def school_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full product column sums: (2L, *batch) uint32 with limbs < 2^23."""
        a, b = jnp.broadcast_arrays(a, b)
        L = self.L
        rest = a.shape[1:]
        p = a[:, None] * b[None, :]  # (L, L, *batch), exact in uint32
        lo = _diag_cols(p & MASK)  # (2L-1, ...)
        hi = _diag_cols(p >> SHIFT)  # contributes at k+1
        zrow = [(0, 0)] * len(rest)
        lo = jnp.pad(lo, [(0, 1), *zrow])  # (2L, ...)
        hi = jnp.pad(hi, [(1, 0), *zrow])  # shift up by one limb
        return lo + hi

    def redc_cols(self, cols: jnp.ndarray, nprod: int = 1) -> jnp.ndarray:
        """Montgomery-reduce a column-space value V (< nprod * N^2) to
        V * R^{-1} mod N. `nprod` is the host-known bound on how many plain
        products were accumulated (incl. small-constant weights); requires
        nprod * N < R, asserted.

        On TPU backends this dispatches to the Toeplitz-matmul variant
        (see redc_cols_matmul): faster (MXU) and immune to the large-batch
        fused-redc miscompile documented there."""
        from .pallas_field import mxu_redc_enabled

        if mxu_redc_enabled():
            return self.redc_cols_matmul(cols, nprod)
        assert nprod * self.modulus < self.spec.mont_r_pow, "REDC bound violated"
        L = self.L
        t = _resolve_carries(cols)  # 2L limbs < 2^16, exact value T
        m = self._low_mul(t[:L], self._bc(self.Nprime, t))
        u_cols = self.school_cols(m, self._bc(self.N, t))  # 2L cols
        # s = t + u; low L limbs are 0 mod R; result is the high half plus
        # the carry out of the low half.
        s = _resolve_carries(t + u_cols)
        res = s[L : 2 * L]
        return self._cond_sub_n(res)

    def _bc(self, c: np.ndarray, like: jnp.ndarray) -> np.ndarray:
        return c.reshape(self.L, *([1] * (like.ndim - 1)))

    # -- MXU (Toeplitz-matmul) Montgomery reduction ------------------------
    # Both REDC multiplies have one CONSTANT operand: m = t_low * N' mod R
    # and u = m * N. Over 8-bit limb planes those are matmuls by constant
    # Toeplitz matrices — products fit f32 exactly (terms < 2^16, sums of
    # <= 2*L8 <= 192 terms < 2^24 mantissa) — so ~60% of the MAC work per
    # Montgomery mul rides the MXU instead of the VPU. This path is also
    # the WORKAROUND for an XLA:TPU miscompile of the fused column-space
    # redc_cols at batch >= 16384 (observed 2026-08-21 on v5e: every lane
    # wrong at B=16384, correct <= 12288; school_cols/_low_mul pass in
    # isolation at every size — only the fused redc graph breaks. The
    # matmul formulation is host-verified correct at every size).
    def _toeplitz8(self):
        if not hasattr(self, "_T8"):
            L8 = 2 * self.L

            def l8(v, n):
                return np.array([(v >> (8 * i)) & 0xFF for i in range(n)], np.float32)

            N8 = l8(self.modulus, L8)
            Np8 = l8(self.spec.n0_inv, L8)
            ki = np.arange(L8)[:, None]
            ii = np.arange(L8)[None, :]
            d = ki - ii
            T_low = np.where(d >= 0, Np8[np.clip(d, 0, L8 - 1)], 0.0).astype(np.float32)
            k2 = np.arange(2 * L8)[:, None]
            d2 = k2 - ii
            T_full = np.where(
                (d2 >= 0) & (d2 < L8), N8[np.clip(d2, 0, L8 - 1)], 0.0
            ).astype(np.float32)
            self._T8 = (T_low, T_full)
        return self._T8

    @staticmethod
    def _to8(t16: jnp.ndarray) -> jnp.ndarray:
        """(R, B) uint32 16-bit limbs -> (2R, B) f32 8-bit limb planes."""
        lo = (t16 & np.uint32(0xFF)).astype(jnp.float32)
        hi = ((t16 >> 8) & np.uint32(0xFF)).astype(jnp.float32)
        return jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(
            2 * t16.shape[0], -1
        )

    @staticmethod
    def _fold16(cols8: jnp.ndarray) -> jnp.ndarray:
        """(2R, B) f32 base-2^8 columns (< 2^24) -> (R, B) uint32 base-2^16
        columns (< 2^30)."""
        c = cols8.astype(jnp.uint32)
        return c[0::2] + (c[1::2] << 8)

    def redc_cols_matmul(self, cols: jnp.ndarray, nprod: int = 1) -> jnp.ndarray:
        """redc_cols twin with the two constant multiplies on the MXU."""
        assert nprod * self.modulus < self.spec.mont_r_pow, "REDC bound violated"
        L = self.L
        shape = cols.shape
        flat = cols.reshape(2 * L, -1)
        t = _resolve_carries(flat)
        T_low, T_full = self._toeplitz8()
        m16 = self._fold16(
            jnp.dot(T_low, self._to8(t[:L]), preferred_element_type=jnp.float32)
        )
        m = _resolve_carries(m16)
        u16 = self._fold16(
            jnp.dot(T_full, self._to8(m), preferred_element_type=jnp.float32)
        )
        s = _resolve_carries(t + u16)
        res = self._cond_sub_n(s[L:])
        return res.reshape(L, *shape[1:])

    def _low_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a * b) mod R: only the low L columns, carry-resolved."""
        a, b = jnp.broadcast_arrays(a, b)
        L = self.L
        # low half of the product table suffices for cols < L
        p = a[:, None] * b[None, :]
        lo = _diag_cols(p & MASK)[:L]
        hi = _diag_cols(p >> SHIFT)[: L - 1]
        rest = a.shape[1:]
        hi = jnp.pad(hi, [(1, 0), *[(0, 0)] * len(rest)])
        return _resolve_carries(lo + hi)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1} mod N (two-multiplication REDC)."""
        a, b = jnp.broadcast_arrays(a, b)
        return self.redc_cols(self.school_cols(a, b))

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def _cond_sub_n(self, a: jnp.ndarray) -> jnp.ndarray:
        d, borrow = _sub_with_borrow(a, self._bc(self.N, a))
        return jnp.where(borrow, a, d)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = _resolve_carries(a + b)
        # note: sum < 2N < R so no top carry is lost
        return self._cond_sub_n(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = _sub_with_borrow(a, b)
        dn = _resolve_carries(d + self._bc(self.N, a))
        return jnp.where(borrow, dn, d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.is_zero(a), a, self._sub_exact(self._bc(self.N, a), a))

    def _sub_exact(self, a, b):
        d, _ = _sub_with_borrow(jnp.broadcast_to(a, b.shape), b)
        return d

    def double_el(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """Multiply by a small constant via repeated additions (k <= ~30)."""
        assert k >= 0
        if k == 0:
            return jnp.broadcast_to(np.zeros((self.L,) + (1,) * (a.ndim - 1), np.uint32), a.shape)
        result = None
        addend = a
        while k:
            if k & 1:
                result = addend if result is None else self.add(result, addend)
            k >>= 1
            if k:
                addend = self.add(addend, addend)
        return result

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        """All-limbs-zero mask over the batch shape (broadcastable against
        (L, *batch): shape (*batch,))."""
        return jnp.all(a == 0, axis=0)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        return jnp.all(a == b, axis=0)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond is a boolean array over the batch shape (broadcasts from the
        right against (L, *batch))."""
        return jnp.where(cond, a, b)

    # -- exponentiation / inversion ---------------------------------------
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host-known exponent, via lax.scan over its bits."""
        if e == 0:
            return jnp.broadcast_to(self.ones(a.shape[1:]), a.shape)
        bits = np.array([int(b) for b in bin(e)[2:]], np.bool_)

        def step(acc, bit):
            acc = self.mont_sqr(acc)
            acc = self.select(bit, self.mont_mul(acc, a), acc)
            return acc, None

        # first bit is the leading 1: start from a
        acc, _ = jax.lax.scan(step, a, bits[1:])
        return acc

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(p-2); a==0 maps to 0."""
        return self.pow_const(a, self.modulus - 2)

    def batch_inv(self, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
        """Batched inversion over one batch axis with a single Fermat
        inversion (Montgomery's trick via parallel prefix/suffix products).

        Zero elements are passed through as zero (matching the projective
        normalization use where Z=0 marks infinity). Implements for real
        what the reference stubbed as BatchExpMode::BatchInversion
        (helpers.rs:89-115)."""
        is_zero = self.is_zero(a)  # (*batch,)
        one_c = self._bc(self.one_mont_np[:, 0][:, None], a)
        safe = jnp.where(is_zero, one_c, a)

        def combine(x, y):
            return self.mont_mul(x, y)

        pre = jax.lax.associative_scan(combine, safe, axis=axis)
        suf = jax.lax.associative_scan(combine, safe, axis=axis, reverse=True)
        nlast = [slice(None)] * a.ndim
        nlast[axis] = slice(-1, None)
        inv_total = self.inv(pre[tuple(nlast)])
        ones1 = list(a.shape)
        ones1[axis] = 1
        one_arr = jnp.broadcast_to(one_c, tuple(ones1))
        sl_head = [slice(None)] * a.ndim
        sl_head[axis] = slice(None, -1)
        sl_tail = [slice(None)] * a.ndim
        sl_tail[axis] = slice(1, None)
        pre_excl = jnp.concatenate([one_arr, pre[tuple(sl_head)]], axis=axis)
        suf_excl = jnp.concatenate([suf[tuple(sl_tail)], one_arr], axis=axis)
        out = self.mont_mul(self.mont_mul(pre_excl, suf_excl), inv_total)
        return jnp.where(is_zero, jnp.broadcast_to(np.zeros((self.L,) + (1,) * (a.ndim - 1), np.uint32), a.shape), out)


@functools.lru_cache(maxsize=None)
def fp_ops(modulus: int) -> FpOps:
    return FpOps(modulus)
