"""Radix-2 (I)FFT over batched curve points — the TPU prepare-phase2 kernel.

Reference behavior: ark-poly `domain.ifft` applied to projective points
(setup-utils/src/groth16_utils.rs:44-53). TPU-first design:

- one compiled program per (curve, group, n): bit-reverse gather, then
  log2(n) butterfly stages; each stage is ONE batched constant-time
  scalar-mul over n/2 points (twiddle scalars precomputed on host as raw
  16-bit limb planes) plus a batched group add/sub pair;
- stage 1 twiddles are all 1, so its scalar-mul is elided;
- the final 1/n scaling is one more batched scalar-mul;
- everything stays projective until the caller normalizes.

Also provides the `h_query` kernel: h[i] = tau^(i+m)·G − tau^i·G for
i < m−1 (groth16_utils.rs:59-63) — a batched group add of negated slices.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..fields.limb import ints_to_limbs_batch
from ..ops.curve_jax import CurveOps, PointVec
from .domain import Radix2Domain


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, np.int32)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


class GroupFFT:
    """(I)FFT over the batch axis of a PointVec for one fixed domain size."""

    def __init__(self, ops: CurveOps, domain: Radix2Domain):
        assert ops.spec.r == domain.r, "domain must be over this curve's Fr"
        self.ops = ops
        self.domain = domain
        self.n = domain.size
        self._rev = _bit_reverse_indices(self.n)
        self._jit_cache = {}

    # -- host twiddle tables -------------------------------------------------
    def _stage_twiddles(self, omega: int) -> list[np.ndarray | None]:
        """Per-stage raw limb scalars, tiled to (Ls, n/2); None where all 1."""
        n, r = self.n, self.domain.r
        L = self.ops.fr.L
        out = []
        m = 2
        while m <= n:
            if m == 2:
                out.append(None)  # w_2^0 = 1 for every butterfly
            else:
                wm = pow(omega, n // m, r)
                tw = [1]
                for _ in range(m // 2 - 1):
                    tw.append(tw[-1] * wm % r)
                tiled = tw * (n // m)  # block-major order matches the reshape
                out.append(np.ascontiguousarray(ints_to_limbs_batch(tiled, L).T))
            m <<= 1
        return out

    def _build(self, inverse: bool):
        ops, n = self.ops, self.n
        omega = self.domain.group_gen_inv if inverse else self.domain.group_gen
        twiddles = self._stage_twiddles(omega)
        rev = self._rev
        scale_raw = None
        if inverse:
            L = ops.fr.L
            scale_raw = np.ascontiguousarray(
                ints_to_limbs_batch([self.domain.size_inv] * n, L).T
            )

        def take_batch(arr, idx):
            import jax.numpy as jnp

            return jnp.take(arr, idx, axis=arr.ndim - 1)

        def f(p: PointVec) -> PointVec:
            import jax.numpy as jnp
            import jax.tree_util as jtu

            x = PointVec(jtu.tree_map(lambda a: take_batch(a, rev), dict(p)))
            m = 2
            for tw in twiddles:
                nblocks = n // m
                half = m // 2

                def split(a):
                    lead = a.shape[:-1]
                    b = a.reshape(*lead, nblocks, m)
                    ev = b[..., :half].reshape(*lead, n // 2)
                    od = b[..., half:].reshape(*lead, n // 2)
                    return ev, od

                ev_od = jtu.tree_map(split, dict(x))
                even = PointVec({k: v[0] for k, v in ev_od.items()})
                odd = PointVec({k: v[1] for k, v in ev_od.items()})
                t = odd if tw is None else ops.scalar_mul(odd, tw)
                hi = ops.add(even, t)
                lo = ops.add(even, ops.neg(t))

                def merge(a_hi, a_lo):
                    lead = a_hi.shape[:-1]
                    a_hi = a_hi.reshape(*lead, nblocks, half)
                    a_lo = a_lo.reshape(*lead, nblocks, half)
                    return jnp.concatenate([a_hi, a_lo], axis=-1).reshape(
                        *lead, n
                    )

                x = PointVec(
                    jtu.tree_map(merge, dict(hi), dict(lo))
                )
                m <<= 1
            if scale_raw is not None:
                x = ops.scalar_mul(x, scale_raw)
            return x

        return jax.jit(f)

    def _get(self, inverse: bool):
        if inverse not in self._jit_cache:
            self._jit_cache[inverse] = self._build(inverse)
        return self._jit_cache[inverse]

    def ifft(self, p: PointVec) -> PointVec:
        """Evaluations -> coefficient points (interpolation over the domain)."""
        assert p["z"].shape[-1] == self.n
        return self._get(True)(p)

    def fft(self, p: PointVec) -> PointVec:
        assert p["z"].shape[-1] == self.n
        return self._get(False)(p)


@functools.lru_cache(maxsize=None)
def group_fft(curve_name: str, group: str, num_coeffs: int) -> GroupFFT:
    from ..ops.curve_jax import curve_ops

    ops = curve_ops(curve_name, group)
    return GroupFFT(ops, Radix2Domain(curve_name, num_coeffs))


_hq_cache = {}


def h_query_device(ops: CurveOps, powers: PointVec, degree: int) -> PointVec:
    """h[i] = powers[i+degree] − powers[i] for i in 0..degree-2, batched.

    Reference: setup-utils/src/groth16_utils.rs:59-63."""
    key = (id(ops), degree)
    if key not in _hq_cache:

        def f(p):
            import jax.tree_util as jtu

            hi = PointVec(
                jtu.tree_map(lambda a: a[..., degree : 2 * degree - 1], dict(p))
            )
            lo = PointVec(
                jtu.tree_map(lambda a: a[..., : degree - 1], dict(p))
            )
            return ops.add(hi, ops.neg(lo))

        _hq_cache[key] = jax.jit(f)
    return _hq_cache[key](powers)
