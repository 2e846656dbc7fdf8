"""Fused GLV decomposition + window-digit extraction as one Pallas kernel.

Motivation (measured, jit-level ablation 2026-08-22, B=16k): the XLA
decompose graph (glv.py — Barrett rounding via (na, nb, B) product tables,
pad/reshape anti-diagonal sums, carry sweeps) costs ~28 ms of a ~210 ms
GLV scalar-mul — HBM-streaming data movement for what is a few dozen limb
operations per lane. It is ALSO the graph family with the measured silent
miscompile at specific wide shapes (32768/32769 lanes — see
shard/runtime.SCALAR_MUL_MAX_LANES). This kernel does the whole thing in
VMEM per 256-lane tile and emits exactly what the fused ladder kernel
consumes: MSB-first w=4 digit planes for both half-scalars plus the sign
masks. Bit-exact parity with GLVOps.decompose/decompose_host is locked by
tests/test_glv.py::test_pallas_digits_match_xla (interpret mode on CPU).

Math mirror of glv.GLVOps.decompose:
  c_i   = round(k * mu_i / 2^S)        (Barrett; mu_i host-precomputed)
  k1    = k - sgn1*c_1*|a1| - sgn2*c_2*|a2|
  k2    = -(sgn1*c_1*|b1| + sgn2*c_2*|b2|)
  m_j, neg_j = |k_j|, k_j < 0
  digits_j = w=4 windows of m_j, MSB first

Column-bound notes (all exact in uint32):
  single limb product < 2^32; lo/hi parts < 2^16; a rectangular schoolbook
  column accumulates min(na, nb) lo+hi terms < 2^21; the resolve folds
  cols>>16 (< 2^5) into 16-bit limbs, staying < 2^17 as _ks_carry needs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limb import LIMB_BITS
from .pallas_field import (
    MASK,
    _resolve_carries_kernel,
    _sub_with_borrow_kernel,
)

WINDOW = 4


def _rect_cols(a_ref_rows, b_rows, out_rows: int):
    """Rectangular schoolbook columns: a (na, TB) x b (nb, TB) -> unresolved
    column sums (out_rows, TB), truncated at out_rows. Static-slice
    concat-stitch updates (the Mosaic-friendly pattern of
    pallas_field._school_cols_accum), rectangular operands."""
    na = a_ref_rows.shape[0]
    nb = b_rows.shape[0]
    TB = a_ref_rows.shape[-1]
    acc = jnp.zeros((out_rows, TB), jnp.uint32)
    for i in range(na):
        if i >= out_rows:
            break
        prod = a_ref_rows[i][None, :] * b_rows  # (nb, TB) exact u32
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        # window rows [i, i+nb) += lo ; [i+1, i+nb+1) += hi, truncated.
        # nb == 1 (single-limb coefficient) would make the middle slice
        # 0-row, which Mosaic rejects — skip it.
        pieces = [lo[:1]]
        if nb > 1:
            pieces.append(lo[1:] + hi[:-1])
        pieces.append(hi[-1:])
        win = jnp.concatenate(pieces, 0)
        n = min(win.shape[0], out_rows - i)
        parts = []
        if i:
            parts.append(acc[:i])
        parts.append(acc[i : i + n] + win[:n])
        if i + n < out_rows:
            parts.append(acc[i + n :])
        acc = jnp.concatenate(parts, 0)
    return acc


def _row_add_const(acc, row: int, val: int):
    """acc[row] += val (host-static row index and value)."""
    parts = []
    if row:
        parts.append(acc[:row])
    parts.append(acc[row : row + 1] + np.uint32(val))
    if row + 1 < acc.shape[0]:
        parts.append(acc[row + 1 :])
    return jnp.concatenate(parts, 0)


def _make_kernel(glv, Ls: int, nwin: int):
    """Kernel body for one GLVOps instance. Constants (mu/coeff limb rows)
    are baked in as host numpy broadcast at trace time via closure over
    TB-tiled arrays passed as refs."""
    S_limbs = glv.S_limbs
    Lc = glv.Lc
    LT = glv.LT
    Lh = glv.Lh
    half_limb = glv.half_limb

    def kernel(k_ref, mu1_ref, mu2_ref, c11_ref, c12_ref, c21_ref, c22_ref,
               d1_ref, d2_ref, neg_ref, flip_ref):
        TB = k_ref.shape[-1]
        k = k_ref[:]

        cs = []
        for mu_ref in (mu1_ref, mu2_ref):
            mu = mu_ref[:]
            rows = Ls + mu.shape[0] + 1
            cols = _rect_cols(k, mu, max(rows, S_limbs + Lc))
            cols = _row_add_const(cols, half_limb, 1 << (LIMB_BITS - 1))
            t = _resolve_carries_kernel(cols)
            cs.append(t[S_limbs : S_limbs + Lc])

        def signed_combine(with_k, term_refs, terms):
            pos = jnp.zeros((LT, TB), jnp.uint32)
            if with_k:
                pad = LT - Ls
                pos = jnp.concatenate(
                    [k, jnp.zeros((pad, TB), jnp.uint32)], 0
                ) if pad > 0 else k[:LT]
            neg = jnp.zeros((LT, TB), jnp.uint32)
            for c, cref, term in zip(cs, term_refs, terms):
                if term is None:
                    continue
                sgn, _limbs = term
                cols = _rect_cols(c, cref[:], LT)
                if sgn > 0:
                    neg = neg + cols
                else:
                    pos = pos + cols
            P = _resolve_carries_kernel(pos)
            N = _resolve_carries_kernel(neg)
            d_pn, no_borrow = _sub_with_borrow_kernel(P, N)
            d_np, _ = _sub_with_borrow_kernel(N, P)
            # pallas convention: no_borrow == 1 -> P >= N
            mag = jnp.where(no_borrow > 0, d_pn, d_np)
            negm = jnp.where(no_borrow > 0, jnp.zeros_like(no_borrow),
                             jnp.ones_like(no_borrow))
            return mag[:Lh], negm

        m1, n1 = signed_combine(True, (c11_ref, c12_ref), glv.k1_terms)
        m2, n2 = signed_combine(False, (c21_ref, c22_ref), glv.k2_terms)

        # MSB-first w=4 digit planes (each 4-bit window lies inside one
        # 16-bit limb since 4 | 16)
        per = LIMB_BITS // WINDOW
        for out_ref, m in ((d1_ref, m1), (d2_ref, m2)):
            rows = []
            for r in range(nwin):
                j = nwin - 1 - r  # LSB window index for MSB-first row r
                limb, sub = divmod(j, per)
                rows.append((m[limb : limb + 1] >> np.uint32(WINDOW * sub))
                            & np.uint32((1 << WINDOW) - 1))
            out_ref[:] = jnp.concatenate(rows, 0)

        neg_ref[:] = n1
        flip_ref[:] = jnp.where(n1 != n2, jnp.ones_like(n1), jnp.zeros_like(n1))

    return kernel


class PallasGLVDigits:
    """Compiled decompose+digits kernel for one CurveOps."""

    TILE_B = 256

    def __init__(self, ops):
        assert ops.glv is not None
        self.ops = ops
        self.glv = ops.glv
        self.Ls = ops.fr.L
        self.nwin = -(-self.glv.p.nbits // WINDOW)
        self._cache = {}

    def tile_b(self) -> int:
        return int(os.environ.get("SNARK_SETUP_GLV_TILE_B", str(self.TILE_B)))

    def _const_tiles(self, TB: int):
        def tile(limbs):
            return np.ascontiguousarray(
                np.broadcast_to(
                    np.asarray(limbs, np.uint32)[:, None], (len(limbs), TB)
                )
            )

        g = self.glv
        mu1, mu2 = g.mu

        def term_tile(term):
            if term is None:
                return np.zeros((1, TB), np.uint32)
            return tile(term[1])

        return [
            tile(mu1), tile(mu2),
            term_tile(g.k1_terms[0]), term_tile(g.k1_terms[1]),
            term_tile(g.k2_terms[0]), term_tile(g.k2_terms[1]),
        ]

    def _call_for(self, Bp: int, TB: int, interpret: bool):
        from jax.experimental import pallas as pl

        key = (Bp, TB, interpret)
        if key not in self._cache:
            kernel = _make_kernel(self.glv, self.Ls, self.nwin)
            consts = self._const_tiles(TB)
            scal = pl.BlockSpec((self.Ls, TB), lambda i: (0, i))
            digit = pl.BlockSpec((self.nwin, TB), lambda i: (0, i))
            mask = pl.BlockSpec((1, TB), lambda i: (0, i))
            cspecs = [
                pl.BlockSpec((c.shape[0], TB), lambda i: (0, 0)) for c in consts
            ]
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((self.nwin, Bp), jnp.uint32),
                    jax.ShapeDtypeStruct((self.nwin, Bp), jnp.uint32),
                    jax.ShapeDtypeStruct((1, Bp), jnp.uint32),
                    jax.ShapeDtypeStruct((1, Bp), jnp.uint32),
                ),
                grid=(Bp // TB,),
                in_specs=[scal] + cspecs,
                out_specs=(digit, digit, mask, mask),
                interpret=interpret,
            ), consts
        return self._cache[key]

    def __call__(self, scalars_raw, interpret: bool = False):
        """(Ls, B) raw standard-form scalar limbs -> (d1, d2, neg1, flip):
        MSB-first (nwin, B) digit planes + (B,) sign masks, all on device."""
        B = scalars_raw.shape[-1]
        TB = min(self.tile_b(), max(128, B))
        Bp = -(-B // TB) * TB
        k = scalars_raw
        if Bp != B:
            k = jnp.pad(jnp.asarray(k), [(0, 0), (0, Bp - B)])
        call, consts = self._call_for(Bp, TB, interpret)
        d1, d2, neg, flip = call(k, *consts)
        if Bp != B:
            d1, d2 = d1[:, :B], d2[:, :B]
            neg, flip = neg[:, :B], flip[:, :B]
        return d1, d2, neg.reshape(-1), flip.reshape(-1)


@functools.lru_cache(maxsize=None)
def glv_digits_for(curve_name: str, group: str) -> PallasGLVDigits:
    from .curve_jax import curve_ops

    return PallasGLVDigits(curve_ops(curve_name, group))
