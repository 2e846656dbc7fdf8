"""Vectorized multi-limb Montgomery field arithmetic in JAX (uint32 lanes).

TPU-first design (see /opt/skills/guides/pallas_guide.md):

- Field elements are little-endian vectors of 16-bit limbs stored in uint32
  lanes, shape (..., L). The TPU has no 64-bit integer multiply; a 16x16
  product fits exactly in a uint32 lane, and schoolbook column sums stay
  below 2^27 (< 2^32), so everything is native VPU int32/uint32 work.
- Montgomery reduction uses the fully-parallel two-multiplication REDC
  (m = t_low * N' mod R; t' = (t + m*N) / R) instead of word-serial CIOS:
  ~2.5x schoolbook muls but no cross-limb sequential dependency, which is
  what XLA/TPU want. Carry resolution is a cheap lax.scan over the limb axis
  (batch stays fully vectorized).
- All loops over limbs are static; batch axes are leading dims, so the same
  code paths vmap/shard_map over device meshes unchanged.

Replaces the arithmetic underneath reference components C5-C7 (batch_exp,
generate_powers_of_tau; setup-utils/src/helpers.rs:32-140).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limb import LIMB_BITS, LIMB_MASK, LimbSpec, int_to_limbs
from .jax_setup import configure_jax

configure_jax()

MASK = jnp.uint32(LIMB_MASK)
SHIFT = LIMB_BITS


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift limbs towards higher indices by d (zero-fill), last axis."""
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _ks_carry(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Binary carry resolution for limbs v < 2^17 via Kogge-Stone
    carry-lookahead (log-depth, fully vectorized — no sequential scan).
    Returns (limbs < 2^16, carry-out-of-top-limb)."""
    L = v.shape[-1]
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
    top_carry = g[..., -1]
    return out, top_carry


def _resolve_carries(cols: jnp.ndarray) -> jnp.ndarray:
    """Propagate carries along the last axis. Input limbs < 2^31;
    output limbs < 2^16 with the final carry dropped (callers guarantee the
    value fits). One redundant round brings limbs under 2^17, then a
    log-depth carry-lookahead finishes — no data-dependent loops."""
    v = (cols & MASK) + _shift_up(cols >> SHIFT, 1)  # limbs < 2^16 + 2^15
    out, _ = _ks_carry(v)
    return out


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise; returns (diff limbs, final borrow mask (bool)).
    Two's-complement addition in base 2^16 with carry-lookahead."""
    L = a.shape[-1]
    w = a + (MASK - b)  # < 2^17
    w = w.at[..., 0].add(1)
    out, top_carry = _ks_carry(w)
    return out, ~top_carry


class FpOps:
    """Montgomery field ops for one modulus, vectorized over leading axes.

    Elements are uint32 arrays (..., L) in Montgomery form (R = 2^(16 L)).
    """

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.spec = LimbSpec(modulus)
        L = self.spec.n_limbs
        self.L = L
        # All closure constants are HOST numpy arrays: jitted functions embed
        # them directly as MLIR constants. (Eager jnp constants would live on
        # the default device — with the tunneled axon TPU backend, lowering
        # then stalls fetching each one back across the tunnel.)
        self.N = int_to_limbs(modulus, L)
        self.Nprime = int_to_limbs(self.spec.n0_inv, L)
        self.R2 = int_to_limbs(self.spec.mont_r2, L)
        self.one_mont_np = int_to_limbs(self.spec.mont_r % modulus, L)
        self.zero_np = np.zeros(L, np.uint32)
        # Gather indices mapping padded product rows onto anti-diagonal
        # column sums: cols[k] = sum_i lo[i, k-i] + sum_i hi[i, k-1-i].
        rows = np.arange(L)[:, None]
        cols2 = np.arange(2 * L)[None, :]
        self._rows_idx = np.broadcast_to(rows, (L, 2 * L)).copy()
        self._gidx_lo = (cols2 - rows) % (2 * L)
        self._gidx_hi = (cols2 - 1 - rows) % (2 * L)

    # -- constants (host numpy; fold into jitted graphs as constants) ------
    def zeros(self, shape=()) -> np.ndarray:
        return np.zeros((*shape, self.L), np.uint32)

    def ones(self, shape=()) -> np.ndarray:
        return np.broadcast_to(self.one_mont_np, (*shape, self.L))

    # -- host conversion (pure host math — no device round trips) ----------
    def from_int(self, values, shape=None) -> np.ndarray:
        """Host ints (standard form) -> Montgomery limbs (host numpy).
        Montgomery conversion v -> v*R mod N is trivial host bigint math."""
        from ..fields.limb import ints_to_limbs_batch

        single = isinstance(values, int)
        if single:
            values = [values]
        R = self.spec.mont_r
        m = self.modulus
        arr = ints_to_limbs_batch([(v % m) * R % m for v in values], self.L)
        return arr[0] if single else arr

    def to_int(self, limbs) -> list[int]:
        """Montgomery limbs (host or device) -> host ints (standard form)."""
        from ..fields.limb import limbs_batch_to_ints

        rinv = pow(self.spec.mont_r, -1, self.modulus)
        arr = np.asarray(limbs)
        return [v * rinv % self.modulus for v in limbs_batch_to_ints(arr)]

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def to_mont_raw(self, a: jnp.ndarray) -> jnp.ndarray:
        """Standard-form limbs -> Montgomery form."""
        return self.mont_mul(a, self.R2)

    # -- core arithmetic ---------------------------------------------------
    # Column-space ("lazy reduction") layer: a full product is kept as 2L
    # anti-diagonal column sums (each < 2L * 2^16 <= 2^23) WITHOUT carry
    # resolution. Independent products stack along a leading axis and several
    # products can be accumulated per column (headroom to 2^31) before ONE
    # Montgomery reduction — this is what keeps XLA graphs small and TPU ops
    # large. Subtraction never appears in column space: callers negate one
    # *input* element instead (exact, cheap), keeping all columns >= 0.
    def school_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full product column sums: (..., 2L) uint32 with limbs < 2^23.

        Anti-diagonal sums are computed with one gather + one reduction per
        product half (rolled rows), which XLA fuses far better than 2L
        dynamic-update-slices."""
        L = self.L
        p = a[..., :, None] * b[..., None, :]  # exact in uint32
        lo = p & MASK
        hi = p >> SHIFT
        pad = [(0, 0)] * (p.ndim - 1) + [(0, L)]
        lo_p = jnp.pad(lo, pad)
        hi_p = jnp.pad(hi, pad)
        cols = (
            lo_p[..., self._rows_idx, self._gidx_lo].sum(axis=-2)
            + hi_p[..., self._rows_idx, self._gidx_hi].sum(axis=-2)
        )
        return cols

    def redc_cols(self, cols: jnp.ndarray, nprod: int = 1) -> jnp.ndarray:
        """Montgomery-reduce a column-space value V (< nprod * N^2) to
        V * R^{-1} mod N. `nprod` is the host-known bound on how many plain
        products were accumulated (incl. small-constant weights); requires
        nprod * N < R, asserted."""
        assert nprod * self.modulus < self.spec.mont_r_pow, "REDC bound violated"
        L = self.L
        t = _resolve_carries(cols)  # 2L limbs < 2^16, exact value T
        m = self._low_mul(t[..., :L], self.Nprime)
        u_cols = self.school_cols(m, self.N)  # 2L cols
        # s = t + u; low L limbs are 0 mod R; result is the high half plus
        # the carry out of the low half.
        s = _resolve_carries(t + u_cols)
        res = s[..., L : 2 * L]
        return self._cond_sub_n(res)

    def _low_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a * b) mod R: only the low L columns, carry-resolved."""
        L = self.L
        cols = self.school_cols(a, b)[..., :L]
        return _resolve_carries(cols)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1} mod N (two-multiplication REDC)."""
        a, b = jnp.broadcast_arrays(a, b)
        return self.redc_cols(self.school_cols(a, b))

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def _cond_sub_n(self, a: jnp.ndarray) -> jnp.ndarray:
        d, borrow = _sub_with_borrow(a, self.N)
        return jnp.where(borrow[..., None], a, d)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = _resolve_carries(a + b)
        # note: sum < 2N < R so no top carry is lost
        return self._cond_sub_n(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, borrow = _sub_with_borrow(a, b)
        dn = _resolve_carries(d + self.N)
        return jnp.where(borrow[..., None], dn, d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.is_zero(a)[..., None], a, self._sub_exact(self.N, a))

    def _sub_exact(self, a, b):
        d, _ = _sub_with_borrow(jnp.broadcast_to(a, b.shape), b)
        return d

    def double_el(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """Multiply by a small constant via repeated additions (k <= ~30)."""
        assert k >= 0
        if k == 0:
            return jnp.zeros_like(a)
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
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond is a boolean array over the batch shape."""
        return jnp.where(cond[..., None], a, b)

    # -- exponentiation / inversion ---------------------------------------
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host-known exponent, via lax.scan over its bits."""
        if e == 0:
            return jnp.broadcast_to(self.ones(), a.shape)
        bits = np.array([int(b) for b in bin(e)[2:]], np.bool_)

        def step(acc, bit):
            acc = self.mont_sqr(acc)
            acc = self.select(jnp.broadcast_to(bit, acc.shape[:-1]), self.mont_mul(acc, a), acc)
            return acc, None

        init = jnp.broadcast_to(self.ones(), a.shape)
        # first bit is the leading 1: start from a
        acc = jnp.where(jnp.ones((), bool), a, init)
        acc, _ = jax.lax.scan(step, acc, jnp.asarray(bits[1:]))
        return acc

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(p-2); a==0 maps to 0."""
        return self.pow_const(a, self.modulus - 2)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batched inversion over the leading axis with a single Fermat
        inversion (Montgomery's trick via parallel prefix/suffix products).

        Zero elements are passed through as zero (matching the projective
        normalization use where Z=0 marks infinity). This implements for
        real what the reference stubbed as BatchExpMode::BatchInversion
        (helpers.rs:89-115)."""
        is_zero = self.is_zero(a)
        safe = jnp.where(is_zero[..., None], self.ones(a.shape[:-1]), a)

        def combine(x, y):
            return self.mont_mul(x, y)

        pre = jax.lax.associative_scan(combine, safe, axis=0)  # inclusive prefix
        total = pre[-1]
        inv_total = self.inv(total)
        # suffix products (exclusive): suf[i] = a[i+1] * ... * a[n-1]
        suf_incl = jax.lax.associative_scan(combine, safe, axis=0, reverse=True)
        n = a.shape[0]
        ones_row = self.ones(a.shape[1:-1])[None] if a.ndim > 1 else self.ones()[None]
        pre_excl = jnp.concatenate([jnp.broadcast_to(ones_row, (1, *a.shape[1:])), pre[:-1]], axis=0)
        suf_excl = jnp.concatenate([suf_incl[1:], jnp.broadcast_to(ones_row, (1, *a.shape[1:]))], axis=0)
        out = self.mont_mul(self.mont_mul(pre_excl, suf_excl), inv_total)
        return jnp.where(is_zero[..., None], jnp.zeros_like(a), out)


@functools.lru_cache(maxsize=None)
def fp_ops(modulus: int) -> FpOps:
    return FpOps(modulus)
