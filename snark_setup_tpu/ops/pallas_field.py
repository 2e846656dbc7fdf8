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


def mxu_redc_enabled() -> bool:
    """Gate for the Toeplitz-matmul Montgomery reduction (fp_jax
    .redc_cols_matmul): on for TPU backends (where the constant multiplies
    ride the MXU and the fused VPU redc graph miscompiles at batch >=
    2^14), overridable with SNARK_SETUP_MXU_REDC=0/1 (1 also forces it on
    CPU — exact there too, just not faster — which is how tests cover it)."""
    flag = os.environ.get("SNARK_SETUP_MXU_REDC", "auto")
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
    over a's limbs, no (L, L, TB) table. Alignment uses STATIC-slice
    .at[i:i+L].add — an L-row read-modify-write — instead of padding each
    partial to 2L rows and adding full-width (the pad variant moves ~2x the
    vregs per limb and measurably halved fused-ladder throughput). The lo
    and hi parts combine at one shifted add so each limb costs one L-row
    multiply + one (L+1)-row update."""
    L = a.shape[0]
    w = np.uint32(weight)
    for i in range(L):
        prod = a[i][None, :] * b  # (L, TB) exact in uint32
        lo = w * (prod & MASK)
        hi = w * (prod >> SHIFT)
        # rows [i, i+L) += lo ; rows [i+1, i+L+1) += hi  -> one fused
        # (L+1)-row window [lo, 0] + [0, hi] added to a STATIC slice and
        # stitched back with concatenate. (.at[].add lowers to a scatter
        # whose captured index constants pallas rejects; dynamic_slice on
        # values has no Pallas TPU lowering — static slices + concat is
        # the pattern Mosaic lowers efficiently, and it halves the
        # row-copy traffic of padding lo/hi to 2L and adding full-width.)
        win = jnp.concatenate([lo[:1], lo[1:] + hi[:-1], hi[-1:]], 0)
        parts = []
        if i:
            parts.append(acc[:i])
        parts.append(acc[i : i + L + 1] + win)
        if i + L + 1 < 2 * L:
            parts.append(acc[i + L + 1 :])
        acc = jnp.concatenate(parts, axis=0)
    return acc


def _redc_kernel(acc, N_b, Np_b):
    """Kernel-side Montgomery reduction of a (2L, TB) column accumulator to
    an (L, TB) element < N. N_b, Np_b: (L, TB)-broadcast modulus / -N^{-1}
    mod 2^16 limb rows. Twin of fp_jax.redc_cols; shared by the stacked-mul
    kernel below and the fused ladder kernel (pallas_ladder.py)."""
    L = N_b.shape[0]
    TB = acc.shape[-1]
    # REDC: t = resolve(acc); m = (t_low * N') mod R; u = m*N;
    # out = high(resolve(t + u)) (- N if >= N)
    t = _resolve_carries_kernel(acc)
    # m = low L columns of t_low * Np (same static-slice update pattern as
    # _school_cols_accum, truncated at row L)
    m_acc = jnp.zeros((L, TB), jnp.uint32)
    for i in range(L):
        prod = t[i][None, :] * Np_b
        lo = prod & MASK
        hi = prod >> SHIFT
        if i + 1 < L:
            win = jnp.concatenate([lo[:1], lo[1 : L - i] + hi[: L - i - 1]], 0)
        else:
            win = lo[:1]
        if i:
            m_acc = jnp.concatenate([m_acc[:i], m_acc[i:] + win], axis=0)
        else:
            m_acc = m_acc + win
    m = _ks_carry_kernel((m_acc & MASK) + jnp.pad(m_acc >> SHIFT, [(1, 0), (0, 0)])[:L])
    u_acc = _school_cols_accum(m, N_b, jnp.zeros((2 * L, TB), jnp.uint32), 1)
    s_full = _resolve_carries_kernel(t + u_acc)
    res = s_full[L:]
    diff, no_borrow = _sub_with_borrow_kernel(res, N_b)
    # no_borrow == 1 -> res >= N -> keep the subtracted value
    return jnp.where(no_borrow > 0, diff, res)


def _make_kernel(L: int, S: int, G: int, weights: tuple):
    """Kernel body for one (stack-shape, weights) signature. The modulus N
    and -N^{-1} mod 2^16 limb rows arrive as (L, 1) inputs (pallas forbids
    captured array constants)."""

    def kernel(u_ref, v_ref, n_ref, np_ref, out_ref):
        TB = u_ref.shape[-1]
        N_b = jnp.broadcast_to(n_ref[:], (L, TB))
        Np_b = jnp.broadcast_to(np_ref[:], (L, TB))
        for g in range(G):
            acc = jnp.zeros((2 * L, TB), jnp.uint32)
            for s in range(S):
                w = weights[g][s]
                if w == 0:
                    continue
                acc = _school_cols_accum(u_ref[:, s], v_ref[:, s], acc, w)
            out_ref[:, g, :] = _redc_kernel(acc, N_b, Np_b)

    return kernel


def _make_cols_kernel(L: int, S: int, G: int, weights: tuple):
    """Product-columns-only kernel: the (L, L, TB) schoolbook table stays in
    VMEM but the Montgomery reduction is NOT fused — the caller reduces the
    (2L, G, B) output with the MXU Toeplitz matmuls (fp_jax
    .redc_cols_matmul). Splitting here lets XLA overlap the VPU product of
    one launch with the MXU reduction of the previous one."""

    def kernel(u_ref, v_ref, out_ref):
        TB = u_ref.shape[-1]
        for g in range(G):
            acc = jnp.zeros((2 * L, TB), jnp.uint32)
            for s in range(S):
                w = weights[g][s]
                if w == 0:
                    continue
                acc = _school_cols_accum(u_ref[:, s], v_ref[:, s], acc, w)
            out_ref[:, g, :] = acc

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

    def cols(self, u, v, weights: tuple, interpret: bool = False):
        """Like __call__ but returns UNREDUCED column sums (2L, G, B) for
        the MXU Toeplitz reduction (fp_jax.redc_cols_matmul)."""
        from jax.experimental import pallas as pl

        L = self.L
        S = u.shape[1]
        B = u.shape[-1]
        G = len(weights)
        if B == 0:
            return jnp.zeros((2 * L, G, 0), jnp.uint32)
        TB = min(self.TILE_B, B)
        Bp = -(-B // TB) * TB
        if Bp != B:
            pad = [(0, 0), (0, 0), (0, Bp - B)]
            u = jnp.pad(u, pad)
            v = jnp.pad(v, pad)
        key = ("cols", S, G, weights, TB, Bp, interpret)
        if key not in self._cache:
            kernel = _make_cols_kernel(L, S, G, weights)
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2 * L, G, Bp), jnp.uint32),
                grid=(Bp // TB,),
                in_specs=[
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                ],
                out_specs=pl.BlockSpec((2 * L, G, TB), lambda i: (0, 0, i)),
                interpret=interpret,
            )
        out = self._cache[key](u, v)
        if Bp != B:
            out = out[..., :B]
        return out


@functools.lru_cache(maxsize=None)
def pallas_mul_for(modulus: int) -> PallasFieldMul:
    from ..fields.limb import LimbSpec

    spec = LimbSpec(modulus)
    return PallasFieldMul(modulus, spec.n_limbs, spec.n0_inv)
