"""Pallas TPU kernel for the stacked Montgomery-product pipeline.

Motivation (measured, BASELINE.md): the pure-XLA path materializes the
(L, L, B) schoolbook product table in HBM, so G1 scalar-mul throughput
*degrades* past batch ~512 (4114 exp/s at 512 → 1462 at 8192). This kernel
fuses product → weighted column merge → REDC per 128-lane batch tile, so
nothing wider than (2L, S, TILE_B) ever leaves VMEM.

One primitive covers every multiplication shape in the group law and the
extension towers (see ext_jax.py): given stacked operands U, V of shape
(L, S, B) and a host-static small non-negative weight matrix W (G, S), it
returns redc(sum_s W[g,s] * cols(U_s * V_s)) of shape (L, G, B) — i.e. G
Montgomery products, each a weighted accumulation of S schoolbook column
products.

Enabled when running on a real TPU backend (or SNARK_SETUP_PALLAS=1);
elsewhere the jnp column-space path in fp_jax/ext_jax remains in force.
The kernel is validated against that path in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limb import LIMB_BITS, LIMB_MASK, int_to_limbs

MASK = np.uint32(LIMB_MASK)
SHIFT = LIMB_BITS


def pallas_enabled() -> bool:
    flag = os.environ.get("SNARK_SETUP_PALLAS", "auto")
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _shift_up_u32(x, dd, L):
    pad = [(dd, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[:L]


def _ks_carry_kernel(v):
    """Kogge-Stone carry resolution for limbs < 2^17 (axis 0), kernel-side
    twin of fp_jax._ks_carry. Carry masks are uint32 0/1 values — Mosaic
    cannot pad/bitcast i1 vector registers."""
    L = v.shape[0]
    g = v >> SHIFT  # v < 2^17 => 0/1
    p = ((v & MASK) + np.uint32(1)) >> SHIFT  # 1 iff low limb == MASK
    d = 1
    while d < L:
        g = g | (p & _shift_up_u32(g, d, L))
        p = p & _shift_up_u32(p, d, L)
        d <<= 1
    return (v + _shift_up_u32(g, 1, L)) & MASK


def _resolve_carries_kernel(cols):
    v = (cols & MASK) + jnp.pad((cols >> SHIFT), [(1, 0)] + [(0, 0)] * (cols.ndim - 1))[: cols.shape[0]]
    return _ks_carry_kernel(v)


def _sub_with_borrow_kernel(a, b):
    L = a.shape[0]
    w = a + (MASK - b)
    one = jnp.pad(jnp.ones((1,) + w.shape[1:], jnp.uint32), [(0, L - 1)] + [(0, 0)] * (w.ndim - 1))
    w = w + one
    g = w >> SHIFT  # 0/1 uint32
    p = ((w & MASK) + np.uint32(1)) >> SHIFT  # 1 iff low limb == MASK
    d = 1
    while d < L:
        g = g | (p & _shift_up_u32(g, d, L))
        p = p & _shift_up_u32(p, d, L)
        d <<= 1
    out = (w + _shift_up_u32(g, 1, L)) & MASK
    # borrow stays 2-D (1, TB) uint32 (0 = borrowed): integer indexing
    # lowers to dynamic_slice, bool pads to i1 bitcasts — Mosaic has neither
    return out, g[L - 1 : L]


def _school_cols_accum(a, b, acc, weight: int):
    """acc (2L, TB) += weight * columns(a * b) for a, b (L, TB): static loop
    over a's limbs, no (L, L, TB) table. Alignment uses jnp.pad (pure
    concatenation) — .at[].add scatters capture constants pallas rejects."""
    L = a.shape[0]
    w = np.uint32(weight)
    for i in range(L):
        prod = a[i][None, :] * b  # (L, TB) exact in uint32
        lo = w * (prod & MASK)
        hi = w * (prod >> SHIFT)
        acc = acc + jnp.pad(lo, [(i, L - i), (0, 0)])
        acc = acc + jnp.pad(hi, [(i + 1, L - i - 1), (0, 0)])
    return acc


def _make_kernel(L: int, S: int, G: int, weights: tuple):
    """Kernel body for one (stack-shape, weights) signature. The modulus N
    and -N^{-1} mod 2^16 limb rows arrive as (L, 1) inputs (pallas forbids
    captured array constants)."""

    def kernel(u_ref, v_ref, n_ref, np_ref, out_ref):
        TB = u_ref.shape[-1]
        N_col = n_ref[:]  # (L, 1)
        Np_col = np_ref[:]
        for g in range(G):
            acc = jnp.zeros((2 * L, TB), jnp.uint32)
            for s in range(S):
                w = weights[g][s]
                if w == 0:
                    continue
                acc = _school_cols_accum(u_ref[:, s], v_ref[:, s], acc, w)
            # REDC: t = resolve(acc); m = (t_low * N') mod R; u = m*N;
            # out = high(resolve(t + u)) (- N if >= N)
            t = _resolve_carries_kernel(acc)
            # m = low L columns of t_low * Np
            Np_b = jnp.broadcast_to(Np_col, (L, TB))
            m_acc = jnp.zeros((L, TB), jnp.uint32)
            for i in range(L):
                prod = t[i][None, :] * Np_b
                lo = prod & MASK
                hi = prod >> SHIFT
                m_acc = m_acc + jnp.pad(lo[: L - i], [(i, 0), (0, 0)])
                if i + 1 < L:
                    m_acc = m_acc + jnp.pad(hi[: L - i - 1], [(i + 1, 0), (0, 0)])
            m = _ks_carry_kernel((m_acc & MASK) + jnp.pad(m_acc >> SHIFT, [(1, 0), (0, 0)])[:L])
            N_b = jnp.broadcast_to(N_col, (L, TB))
            u_acc = jnp.zeros((2 * L, TB), jnp.uint32)
            for i in range(L):
                prod = m[i][None, :] * N_b
                lo = prod & MASK
                hi = prod >> SHIFT
                u_acc = u_acc + jnp.pad(lo, [(i, L - i), (0, 0)])
                u_acc = u_acc + jnp.pad(hi, [(i + 1, L - i - 1), (0, 0)])
            s_full = _resolve_carries_kernel(t + u_acc)
            res = s_full[L:]
            diff, no_borrow = _sub_with_borrow_kernel(res, N_b)
            # no_borrow == 1 -> res >= N -> keep the subtracted value
            out_ref[:, g, :] = jnp.where(no_borrow > 0, diff, res)

    return kernel


class PallasFieldMul:
    """Stacked-product-and-REDC pallas primitive for one modulus."""

    TILE_B = 256

    def __init__(self, modulus: int, L: int, nprime: int):
        self.modulus = modulus
        self.L = L
        self.N_row = int_to_limbs(modulus, L)  # (L,)
        self.Np_row = int_to_limbs(nprime, L)
        self._cache = {}

    def __call__(self, u, v, weights: tuple, interpret: bool = False):
        """u, v: (L, S, B) uint32 stacked Montgomery operands.
        weights: tuple of G tuples of S small non-negative ints.
        Returns (L, G, B)."""
        from jax.experimental import pallas as pl

        L = self.L
        S = u.shape[1]
        B = u.shape[-1]
        G = len(weights)
        if B == 0:
            # associative_scan recursion leaves can produce empty slices
            return jnp.zeros((L, G, 0), jnp.uint32)
        TB = min(self.TILE_B, B)
        # pad B to a multiple of TB
        Bp = -(-B // TB) * TB
        if Bp != B:
            pad = [(0, 0), (0, 0), (0, Bp - B)]
            u = jnp.pad(u, pad)
            v = jnp.pad(v, pad)

        key = (S, G, weights, TB, Bp, interpret)
        if key not in self._cache:
            kernel = _make_kernel(L, S, G, weights)
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, G, Bp), jnp.uint32),
                grid=(Bp // TB,),
                in_specs=[
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((L, 1), lambda i: (0, 0)),
                    pl.BlockSpec((L, 1), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((L, G, TB), lambda i: (0, 0, i)),
                interpret=interpret,
            )
        out = self._cache[key](u, v, self.N_row[:, None], self.Np_row[:, None])
        if Bp != B:
            out = out[..., :B]
        return out


@functools.lru_cache(maxsize=None)
def pallas_mul_for(modulus: int) -> PallasFieldMul:
    from ..fields.limb import LimbSpec

    spec = LimbSpec(modulus)
    return PallasFieldMul(modulus, spec.n_limbs, spec.n0_inv)
