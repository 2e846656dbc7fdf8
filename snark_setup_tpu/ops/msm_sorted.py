"""Sort + suffix-scan MSM — the TPU-shaped bucket method.

The classic Pippenger bucket loop is a scatter per (point, window); XLA
scatter on TPU serializes badly (measured: the bucket kernel in
pippenger.py runs its ~10x-fewer field muls ~20x less efficiently than the
dense ladder, netting a LOSS). This variant uses only dense, TPU-friendly
primitives — argsort, gather along the batch axis, and one reverse
`associative_scan` of complete group adds per window:

  For one c-bit window with unsigned digits d_i:
      sum_i d_i P_i = sum_{k=1}^{2^c-1} T_k,   T_k = sum_{d_i >= k} P_i.
  Sort the points by digit ascending; then every T_k is one row of the
  suffix-sum scan, at position searchsorted(d_sorted, k). One scan gives
  all 2^c - 1 bucket-tail sums; a gather + tree-reduce finishes the
  window, and windows combine MSB-first with c doublings each
  (sum-of-suffix-sums replaces the sequential bucket finalize entirely).

Group-op count per window ~ 2B scan combines + 2^c - 1 reduce adds, all at
full batch width — ~6x fewer field muls than the GLV ladder at the 128-bit
RLC width, with no scatters. Digits/permutations are computed host-side
(scalars are public verifier randomness).

Replaces msm_bigint in merge_pairs (setup-utils/src/helpers.rs:371-384)
for large batches; see ops/msm.py for the size-based dispatch.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.limb import LIMB_BITS
from .curve_jax import CurveOps, PointVec

_DEF_C = 8


def unsigned_digits_host(scalars_raw: np.ndarray, nbits: int, c: int = _DEF_C):
    """(Ls, B) raw 16-bit limb scalars -> (nwin, B) unsigned c-bit digits,
    LSB-window first. Pure numpy."""
    assert c <= LIMB_BITS
    Ls, B = scalars_raw.shape
    nwin = -(-nbits // c)
    t = scalars_raw.astype(np.uint64)
    digs = np.empty((nwin, B), np.uint32)
    mask = (1 << c) - 1
    for k in range(nwin):
        bit0 = k * c
        limb, off = divmod(bit0, LIMB_BITS)
        v = t[limb] >> off if limb < Ls else np.zeros(B, np.uint64)
        if off + c > LIMB_BITS and limb + 1 < Ls:
            v = v | (t[limb + 1] << (LIMB_BITS - off))
        digs[k] = v & mask
    return digs


class SortedMSM:
    """Compiled sort+scan MSM for one (ops, B, nbits, c) signature."""

    def __init__(self, ops: CurveOps, batch: int, nbits: int, c: int = _DEF_C):
        self.ops = ops
        self.B = batch
        self.nbits = nbits
        self.c = c
        self.nwin = -(-nbits // c)
        self._jit = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        ops = self.ops
        F = ops.field
        el_ndim = 1 if F.degree == 1 else 2
        B, c, nwin = self.B, self.c, self.nwin
        nb = (1 << c) - 1  # boundary count (k = 1 .. 2^c - 1)

        def take_b(arr, idx):
            return jnp.take(arr, idx, axis=arr.ndim - 1)

        def f(p, perms, bounds):
            # p coords (L[, d], B); perms (nwin, B) int32 (ascending-digit
            # order, MSB window first); bounds (nwin, nb) int32 positions
            # into the suffix array (B means "empty tail" -> identity).
            inf1 = {
                "x": np.asarray(F.zeros((1,))),
                "y": np.asarray(F.ones((1,))),
                "z": np.asarray(F.zeros((1,))),
            }

            def window(T, sl):
                perm, bnd = sl
                sp = {k: take_b(v, perm) for k, v in p.items()}
                # suffix sums: scan from the top of the sorted order
                suf = jax.lax.associative_scan(
                    lambda a, b: dict(ops.add(PointVec(a), PointVec(b))),
                    sp,
                    axis=sp["x"].ndim - 1,
                    reverse=True,
                )
                # append identity row so bounds == B selects "empty"
                suf = {
                    k: jnp.concatenate(
                        [v, jnp.broadcast_to(inf1[k], v.shape[:-1] + (1,))], -1
                    )
                    for k, v in suf.items()
                }
                rows = PointVec({k: take_b(v, bnd) for k, v in suf.items()})
                w_sum = ops.sum_reduce(rows)  # (.., 1)
                T = ops._window_doubles(T, c)
                return ops.add(T, w_sum), None

            T0 = ops.infinity((1,))
            T, _ = jax.lax.scan(window, T0, (perms, bounds))
            return dict(T)

        return jax.jit(f)

    def __call__(self, pts: PointVec, scalars_raw: np.ndarray) -> PointVec:
        if self._jit is None:
            self._jit = self._build()
        B = self.B
        sc = np.asarray(scalars_raw)
        assert sc.shape[-1] == B, "scalar batch must match the point batch"
        digs = unsigned_digits_host(sc, self.nbits, self.c)
        perms = np.empty((self.nwin, B), np.int32)
        bounds = np.empty((self.nwin, (1 << self.c) - 1), np.int32)
        ks = np.arange(1, 1 << self.c)
        for w in range(self.nwin):
            order = np.argsort(digs[w], kind="stable").astype(np.int32)
            perms[w] = order
            bounds[w] = np.searchsorted(digs[w][order], ks, side="left").astype(
                np.int32
            )
        # MSB window first for the doubling chain
        out = self._jit(dict(pts), perms[::-1].copy(), bounds[::-1].copy())
        return PointVec(out)


@functools.lru_cache(maxsize=None)
def sorted_msm_for(curve_name: str, group: str, batch: int, nbits: int, c: int = _DEF_C) -> SortedMSM:
    from .curve_jax import curve_ops

    ops = curve_ops(curve_name, group)
    return SortedMSM(ops, batch, nbits, c)
