"""Batched square roots on device (branchless Tonelli–Shanks).

Needed for on-device point decompression: compressed accumulator files store
only x (plus a y-sign flag), so reading a batch requires sqrt(x^3+ax+b) per
element. Data-dependent control flow is replaced by a fixed e-iteration loop
with constant-time selects (e = 2-adicity of p-1), which XLA compiles to a
static schedule.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from .fp_jax import FpOps


class SqrtOps:
    def __init__(self, fp: FpOps):
        self.fp = fp
        p = fp.modulus
        self.p = p
        s, e = p - 1, 0
        while s % 2 == 0:
            s //= 2
            e += 1
        self.e = e
        self.s = s
        # fixed quadratic non-residue
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        self.z = z
        self.c0 = pow(z, s, p)  # generator of the 2-Sylow subgroup

    def sqrt(self, a):
        """Returns (root, is_square_mask). root is garbage where not square;
        a==0 -> (0, True)."""
        fp = self.fp
        p = self.p
        if self.e == 1:
            # p ≡ 3 (mod 4)
            r = fp.pow_const(a, (p + 1) // 4)
            ok = fp.eq(fp.mont_sqr(r), a) | fp.is_zero(a)
            return r, ok
        # Tonelli-Shanks, constant iteration count
        w = fp.pow_const(a, (self.s - 1) // 2)
        r = fp.mont_mul(a, w)  # a^((s+1)/2)
        t = fp.mont_mul(r, w)  # a^s
        c = fp.from_int(self.c0)
        one = fp.ones(a.shape[:-1])
        for i in range(self.e, 1, -1):
            # b = t^(2^(i-2))
            b = t
            for _ in range(i - 2):
                b = fp.mont_sqr(b)
            flip = ~fp.eq(b, one)
            r = fp.select(flip, fp.mont_mul(r, c), r)
            c2 = fp.mont_sqr(c)
            t = fp.select(flip, fp.mont_mul(t, c2), t)
            c = c2
        ok = fp.eq(fp.mont_sqr(r), a) | fp.is_zero(a)
        return r, ok

    def is_geq_half(self, y):
        """y > p - y  <=>  y >= (p+1)/2 (the arkworks 'negative' flag)."""
        from .fp_jax import _sub_with_borrow
        from ..fields.limb import int_to_limbs

        half = int_to_limbs((self.p + 1) // 2, self.fp.L)
        y_std = self.fp.from_mont(y)
        _, borrow = _sub_with_borrow(y_std, jnp.broadcast_to(half, y_std.shape))
        return ~borrow  # no borrow => y >= half


@functools.lru_cache(maxsize=None)
def sqrt_ops(modulus: int) -> SqrtOps:
    from .fp_jax import fp_ops

    return SqrtOps(fp_ops(modulus))
