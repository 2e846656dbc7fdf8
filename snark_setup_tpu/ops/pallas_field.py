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


# ---------------------------------------------------------------------------
# v2 fused kernel: f32 byte-plane schoolbook + in-kernel MXU Toeplitz REDC
# ---------------------------------------------------------------------------
# Motivation (measured on v5e, 2026-08-21): with the v1 split (pallas
# product kernel -> XLA-level MXU redc), the elementwise glue between the
# two Toeplitz matmuls (carry resolves, byte splits, folds) runs as XLA HLO
# streaming (2L, G, B) uint32 planes through HBM ~10x per reduction — a lone
# field add costs 0.227 ms at batch 16k, 1.5x a whole in-kernel product.
# This kernel keeps the ENTIRE Montgomery multiply in VMEM and swaps the
# u32 16-bit schoolbook (mult + mask + shift + two window adds per limb)
# for an 8-bit-plane f32 FMA schoolbook:
#
#   a*b = (al + 2^8 ah)(bl + 2^8 bh): accumulate THREE f32 column planes
#   A1 = sum al_i bl_j, A2 = sum (al_i bh_j + ah_i bl_j), A3 = sum ah_i bh_j
#   (terms < 2^16, each plane < 2L*65025*sum(w) <= 2^24 -> exact in f32),
#   then combine c16[k] = A1[k] + 256*A2[k] + A3[k-1] in u32.
#
# REDC rides the MXU with blocked-layout Toeplitz matmuls (no strided row
# access — host-side row/column permutations bake the byte interleave into
# the constant matrices):
#   m16 = fold(T_low4 @ bytes4(c[:L]))   — m = c * N' mod R, exact: the
#         4-byte split of the UNRESOLVED low columns feeds the matmul
#         directly (mod-R drops escaped carries), skipping one full
#         carry resolve vs the v1 pipeline
#   u16 = fold(T_full @ bytes2(resolve(m16)))  — u = m * N
#   out = condsub(resolve(c + u16)[L:])
def _u2f(x):
    """u32 -> f32 via i32 (Mosaic has no direct u32<->f32 cast); callers
    guarantee values < 2^31."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _f2u(x):
    """f32 -> u32 via i32; values < 2^31."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _split2_f32(t):
    """(R, TB) u32 16-bit limbs -> (2R, TB) f32 blocked byte planes
    [lo; hi] (static concat, no interleave)."""
    return jnp.concatenate([_u2f(t & np.uint32(0xFF)), _u2f(t >> 8)], 0)


def _split4_f32(c):
    """(R, TB) u32 (< 2^32) -> (4R, TB) f32 blocked byte planes."""
    return jnp.concatenate(
        [
            _u2f(c & np.uint32(0xFF)),
            _u2f((c >> 8) & np.uint32(0xFF)),
            _u2f((c >> 16) & np.uint32(0xFF)),
            _u2f(c >> 24),
        ],
        0,
    )


def _wadd(acc, i, win):
    """acc[i:i+rows(win)] += win via static-slice concat-stitch."""
    n = win.shape[0]
    parts = []
    if i:
        parts.append(acc[:i])
    parts.append(acc[i : i + n] + win)
    if i + n < acc.shape[0]:
        parts.append(acc[i + n :])
    return jnp.concatenate(parts, 0)


def _school_f32_accum(a16, bl, bh, A1, A2, A3, weight: int):
    """Accumulate weight * byte-plane columns of a16 * b into A1/A2/A3
    ((2L, TB) f32 each). a16: (L, TB) u32 16-bit limbs; bl/bh: (L, TB) f32
    byte planes of the other operand."""
    L = a16.shape[0]
    w = np.float32(weight)
    for i in range(L):
        row = a16[i : i + 1]
        al = _u2f(row & np.uint32(0xFF))
        ah = _u2f(row >> 8)
        if weight != 1:
            al = al * w
            ah = ah * w
        A1 = _wadd(A1, i, al * bl)
        A2 = _wadd(A2, i, al * bh + ah * bl)
        A3 = _wadd(A3, i, ah * bh)
    return A1, A2, A3


def redc_matrices(modulus: int, n0_inv: int, L: int):
    """Blocked-layout Toeplitz REDC matrices (host, f32).

    T_low4 (2L, 4L): maps the 4-byte blocked split of the low L unresolved
    columns to the blocked byte rows of m = c * N' mod R.
    T_full (4L, 2L): maps the 2-byte blocked split of resolved m to the
    blocked byte rows of u = m * N (2L bytes in -> 4L bytes out).
    Blocked layout: output row r < half -> byte digit 2r (even), else
    2(r-half)+1; input col p*L + i -> byte digit 2i + p."""

    def bytes_of(v, n):
        return np.array([(v >> (8 * k)) & 0xFF for k in range(n)], np.float32)

    Np8 = bytes_of(n0_inv, 2 * L)
    N8 = bytes_of(modulus, 2 * L)

    def build(coeffs, out_digits, in_blocks):
        nin = in_blocks * L
        rows = out_digits  # == number of byte digits kept
        M = np.zeros((rows, nin), np.float32)
        for col in range(nin):
            p, i = divmod(col, L)
            d_in = 2 * i + p
            for r in range(rows):
                half = rows // 2
                k = 2 * r if r < half else 2 * (r - half) + 1
                d = k - d_in
                if 0 <= d < 2 * L:
                    M[r, col] = coeffs[d]
        return M

    T_low4 = build(Np8, 2 * L, 4)  # keep byte digits 0..2L-1 (mod R)
    T_full = build(N8, 4 * L, 2)
    return T_low4, T_full


def _redc_v2_kernel(c, tlow, tfull, N_b, fused_s: bool):
    """In-kernel Montgomery reduction of (2L, TB) u32 columns via two MXU
    matmuls. `fused_s` (host-decided bound check) fuses the final carry
    resolve of c with the +u16 add."""
    L = N_b.shape[0]
    y = jnp.dot(tlow, _split4_f32(c[:L]), preferred_element_type=jnp.float32)
    m16 = _f2u(y[:L]) + (_f2u(y[L:]) << 8)
    m = _resolve_carries_kernel(m16)
    u = jnp.dot(tfull, _split2_f32(m), preferred_element_type=jnp.float32)
    u16 = _f2u(u[: 2 * L]) + (_f2u(u[2 * L :]) << 8)
    if fused_s:
        s = _resolve_carries_kernel(c + u16)
    else:
        s = _resolve_carries_kernel(_resolve_carries_kernel(c) + u16)
    res = s[L:]
    diff, no_borrow = _sub_with_borrow_kernel(res, N_b)
    return jnp.where(no_borrow > 0, diff, res)


def v2_bounds(L: int, weights: tuple):
    """(supported, fused_s) for the f32 byte-plane kernel: every A-plane
    must stay exact in f32 (< 2^24) and, when fused_s, c + u16 must fit
    u32."""
    max_sw = max(sum(g) for g in weights)
    P = 255 * 255
    a2 = 2 * L * P * max_sw
    c_bound = 2 * (L * P * max_sw) + (a2 << 8)
    if a2 >= 1 << 24 or c_bound >= 1 << 32:
        return False, False
    u16_bound = 2 * L * P * 257
    return True, c_bound + u16_bound < (1 << 32)


def _make_kernel_v2(L: int, S: int, G: int, weights: tuple, fused_s: bool):
    """Fully-fused stacked Montgomery products: f32 schoolbook + MXU REDC,
    nothing leaves VMEM between the product and the reduced output."""

    def kernel(u_ref, v_ref, tlow_ref, tfull_ref, n_ref, out_ref):
        TB = u_ref.shape[-1]
        N_b = jnp.broadcast_to(n_ref[:], (L, TB))
        tlow = tlow_ref[:]
        tfull = tfull_ref[:]
        # hoist byte planes of the v-side (reused across output groups)
        vl = [None] * S
        vh = [None] * S
        for s in range(S):
            if any(weights[g][s] for g in range(G)):
                vs = v_ref[:, s]
                vl[s] = _u2f(vs & np.uint32(0xFF))
                vh[s] = _u2f(vs >> 8)
        for g in range(G):
            A1 = jnp.zeros((2 * L, TB), jnp.float32)
            A2 = jnp.zeros((2 * L, TB), jnp.float32)
            A3 = jnp.zeros((2 * L, TB), jnp.float32)
            for s in range(S):
                w = weights[g][s]
                if w == 0:
                    continue
                A1, A2, A3 = _school_f32_accum(
                    u_ref[:, s], vl[s], vh[s], A1, A2, A3, w
                )
            c = (
                _f2u(A1)
                + (_f2u(A2) << 8)
                + _shift_up_u32(_f2u(A3), 1, 2 * L)
            )
            out_ref[:, g, :] = _redc_v2_kernel(c, tlow, tfull, N_b, fused_s)

    return kernel


def _make_kernel_v3(L: int, S: int, G: int, weights: tuple):
    """Hybrid: u32 16-bit schoolbook accumulate (the measured-fastest
    product path) + in-kernel MXU Toeplitz REDC (_redc_v2_kernel) — moves
    the two REDC multiplies (~60% of the MAC work) off the VPU without the
    f32 byte-plane product's extra accumulator planes. Columns from the u32
    schoolbook are < nprod * 2L * 2^16 << 2^31, so the fused final resolve
    always applies."""

    def kernel(u_ref, v_ref, tlow_ref, tfull_ref, n_ref, out_ref):
        TB = u_ref.shape[-1]
        N_b = jnp.broadcast_to(n_ref[:], (L, TB))
        tlow = tlow_ref[:]
        tfull = tfull_ref[:]
        for g in range(G):
            acc = jnp.zeros((2 * L, TB), jnp.uint32)
            for s in range(S):
                w = weights[g][s]
                if w == 0:
                    continue
                acc = _school_cols_accum(u_ref[:, s], v_ref[:, s], acc, w)
            out_ref[:, g, :] = _redc_v2_kernel(acc, tlow, tfull, N_b, True)

    return kernel


def kernel_v3_enabled() -> bool:
    """Gate for the hybrid u32-schoolbook + in-kernel-MXU-REDC kernel
    (opt-in until measured on hardware; SNARK_SETUP_KERNEL_V3=1)."""
    return os.environ.get("SNARK_SETUP_KERNEL_V3", "0") in ("1", "on", "true")


def kernel_v2_enabled() -> bool:
    """Gate for the fused f32+MXU stacked-mul kernel. OPT-IN (measured
    2026-08-21 on v5e at batch 16k: 19.6k exp/s vs 44.6k for the fused u32
    kernel — the f32 byte-plane schoolbook triples the accumulator planes
    and Mosaic's in-kernel matmul does not overlap enough to pay for them).
    Kept as the base for future MXU-heavy variants; correctness is locked
    by interpret-mode tests either way."""
    return os.environ.get("SNARK_SETUP_KERNEL_V2", "0") in ("1", "on", "true")


def mxu_stacked_forced() -> bool:
    """Route mul_stacked through the SPLIT pipeline (pallas product-columns
    kernel + XLA-level MXU Toeplitz redc) instead of the fully-fused u32
    pallas kernel. OPT-IN for experiments: the A/B on v5e (2026-08-21,
    benches/kernel_ab.py, batch 16k) measured split 31.4k exp/s vs fused
    44.6k, both host-oracle-correct — the r3 large-batch miscompile lived
    in the XLA jnp fused-redc graph (fp_jax.redc_cols, still routed to the
    matmul twin on TPU via mxu_redc_enabled), NOT in the pallas kernel."""
    return os.environ.get("SNARK_SETUP_MXU_STACKED", "0") in ("1", "on", "true")


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
        TB = min(self.tile_b(), B)
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

    def v3(self, u, v, weights: tuple, interpret: bool = False):
        """Hybrid u32 schoolbook + in-kernel MXU REDC (see _make_kernel_v3).
        Same contract as __call__."""
        from jax.experimental import pallas as pl

        L = self.L
        S = u.shape[1]
        B = u.shape[-1]
        G = len(weights)
        if B == 0:
            return jnp.zeros((L, G, 0), jnp.uint32)
        TB = min(self.tile_b(), B)
        Bp = -(-B // TB) * TB
        if Bp != B:
            pad = [(0, 0), (0, 0), (0, Bp - B)]
            u = jnp.pad(u, pad)
            v = jnp.pad(v, pad)
        key = ("v3", S, G, weights, TB, Bp, interpret)
        if key not in self._cache:
            kernel = _make_kernel_v3(L, S, G, weights)
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, G, Bp), jnp.uint32),
                grid=(Bp // TB,),
                in_specs=[
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((2 * L, 4 * L), lambda i: (0, 0)),
                    pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0)),
                    pl.BlockSpec((L, 1), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((L, G, TB), lambda i: (0, 0, i)),
                interpret=interpret,
            )
        tlow, tfull = self._redc_matrices()
        out = self._cache[key](u, v, tlow, tfull, self.N_row[:, None])
        if Bp != B:
            out = out[..., :B]
        return out

    def _redc_matrices(self):
        if not hasattr(self, "_redc_mats"):
            from ..fields.limb import LimbSpec

            spec = LimbSpec(self.modulus)
            self._redc_mats = redc_matrices(self.modulus, spec.n0_inv, self.L)
        return self._redc_mats

    def tile_b(self) -> int:
        """Batch-tile width; SNARK_SETUP_TILE_B overrides for sweeps."""
        return int(os.environ.get("SNARK_SETUP_TILE_B", str(self.TILE_B)))

    def v2_supported(self, weights: tuple) -> bool:
        ok, _ = v2_bounds(self.L, weights)
        return ok and self.modulus * max(sum(g) for g in weights) < (
            1 << (16 * self.L)
        )

    def v2(self, u, v, weights: tuple, interpret: bool = False):
        """Fused f32-schoolbook + in-kernel MXU REDC path (see
        _make_kernel_v2). Same contract as __call__."""
        from jax.experimental import pallas as pl

        L = self.L
        S = u.shape[1]
        B = u.shape[-1]
        G = len(weights)
        if B == 0:
            return jnp.zeros((L, G, 0), jnp.uint32)
        ok, fused_s = v2_bounds(L, weights)
        assert ok, "weights exceed f32 exactness bounds — use the u32 path"
        TB = min(self.tile_b(), B)
        Bp = -(-B // TB) * TB
        if Bp != B:
            pad = [(0, 0), (0, 0), (0, Bp - B)]
            u = jnp.pad(u, pad)
            v = jnp.pad(v, pad)
        key = ("v2", S, G, weights, TB, Bp, interpret)
        if key not in self._cache:
            kernel = _make_kernel_v2(L, S, G, weights, fused_s)
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, G, Bp), jnp.uint32),
                grid=(Bp // TB,),
                in_specs=[
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((L, S, TB), lambda i: (0, 0, i)),
                    pl.BlockSpec((2 * L, 4 * L), lambda i: (0, 0)),
                    pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0)),
                    pl.BlockSpec((L, 1), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((L, G, TB), lambda i: (0, 0, i)),
                interpret=interpret,
            )
        tlow, tfull = self._redc_matrices()
        out = self._cache[key](u, v, tlow, tfull, self.N_row[:, None])
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
        TB = min(self.tile_b(), B)
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
