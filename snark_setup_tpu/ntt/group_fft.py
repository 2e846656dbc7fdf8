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
    def _stage_tables(self, omega: int):
        """Per-stage host tables, all with STAGE-UNIFORM shapes so the
        stage loop can be one lax.scan (the batched scalar-mul ladder —
        the bulk of the graph — then traces and compiles exactly once
        instead of once per stage):
          tw   (stages, Ls, n/2) raw twiddle limb scalars (stage 1 all-ones)
          ev   (stages, n/2)     gather indices of butterfly even inputs
          od   (stages, n/2)     gather indices of butterfly odd inputs
          perm (stages, n)       output permutation over concat(hi, lo)
        """
        n, r = self.n, self.domain.r
        L = self.ops.fr.L
        tws, evs, ods, perms = [], [], [], []
        m = 2
        while m <= n:
            nblocks, half = n // m, m // 2
            wm = pow(omega, n // m, r)
            tw = [1]
            for _ in range(half - 1):
                tw.append(tw[-1] * wm % r)
            tiled = tw * nblocks  # block-major order
            tws.append(np.ascontiguousarray(ints_to_limbs_batch(tiled, L).T))
            blocks = np.arange(nblocks, dtype=np.int32)[:, None] * m
            j = np.arange(half, dtype=np.int32)[None, :]
            evs.append((blocks + j).reshape(-1))
            ods.append((blocks + half + j).reshape(-1))
            perm = np.empty(n, np.int32)
            flat = (blocks // m) * half + j  # hi/lo flat index per (block, j)
            perm[(blocks + j).reshape(-1)] = flat.reshape(-1)
            perm[(blocks + half + j).reshape(-1)] = n // 2 + flat.reshape(-1)
            perms.append(perm)
            m <<= 1
        return (
            np.stack(tws),
            np.stack(evs),
            np.stack(ods),
            np.stack(perms),
        )

    def _tables(self, inverse: bool):
        """Host table tuple (twiddles, gather indices, permutation, bit-rev,
        inverse scale) for one direction — passed to the compiled program
        as ARGUMENTS, not baked as constants: at 2^18 the stage-uniform
        twiddle array alone is ~150 MB, and constant-baking it made the
        serialized compile request exceed the tunneled backend's request
        body limit (HTTP 413) besides bloating the executable."""
        key = ("tables", inverse)
        if key not in self._jit_cache:
            ops, n = self.ops, self.n
            omega = (
                self.domain.group_gen_inv if inverse else self.domain.group_gen
            )
            tw_arr, ev_idx, od_idx, perm = self._stage_tables(omega)
            scale_raw = None
            if inverse:
                L = ops.fr.L
                scale_raw = np.ascontiguousarray(
                    ints_to_limbs_batch([self.domain.size_inv] * n, L).T
                )
            else:
                L = ops.fr.L
                scale_raw = np.ascontiguousarray(
                    ints_to_limbs_batch([1] * n, L).T
                )
            self._jit_cache[key] = (
                tw_arr, ev_idx, od_idx, perm, self._rev, scale_raw, inverse,
            )
        return self._jit_cache[key]

    # Widest lane span of one stage scalar-mul trace. Two reasons, both
    # measured: (a) the wide-graph miscompile family (KNOWN_ISSUES.md #1);
    # (b) device MEMORY — the extension-field (G2) ladder has no
    # VMEM-resident fused kernel, so its 2x16-entry window tables
    # materialize in HBM at ~(L*d*16*B*4 B) per coordinate: at 2^17 lanes
    # on BLS12-377 G2 that is ~10 GB and the v5e worker OOM-crashes
    # (observed 2026-08-22 at the 2^18 prepare run). 2^14-lane slices keep
    # the table working set ~1.2 GB.
    MAX_SM_LANES = 1 << 14

    def _traceable(self):
        """The direction-agnostic traced function f(p, tables) -> PointVec
        (tables from _tables; the final scale is all-ones for the forward
        direction so one trace serves both)."""
        ops = self.ops
        M = self.MAX_SM_LANES

        def sm_bounded(pts: PointVec, tw):
            import jax.numpy as jnp

            B = pts["x"].shape[-1]
            if B <= M:
                return ops.scalar_mul(pts, tw)
            outs = [
                dict(
                    ops.scalar_mul(
                        PointVec({k: v[..., lo : lo + M] for k, v in pts.items()}),
                        tw[..., lo : lo + M],
                    )
                )
                for lo in range(0, B, M)
            ]
            return PointVec(
                {
                    k: jnp.concatenate([o[k] for o in outs], axis=-1)
                    for k in ("x", "y", "z")
                }
            )

        def butterfly_bounded(even: PointVec, odd: PointVec, tw):
            """One butterfly's compute (t = tw*odd; hi = even+t;
            lo = even-t), sliced so no single group-op trace spans more
            than M lanes — at n=2^16 the full-width stage ADDS crashed the
            v5e worker even with the scalar-muls already sliced."""
            import jax.numpy as jnp

            B = even["x"].shape[-1]
            his, los = [], []
            for lo_i in range(0, B, M):
                ev = PointVec(
                    {k: v[..., lo_i : lo_i + M] for k, v in even.items()}
                )
                od = PointVec(
                    {k: v[..., lo_i : lo_i + M] for k, v in odd.items()}
                )
                t = ops.scalar_mul(od, tw[..., lo_i : lo_i + M])
                his.append(dict(ops.add(ev, t)))
                los.append(dict(ops.add(ev, ops.neg(t))))
            if len(his) == 1:
                return PointVec(his[0]), PointVec(los[0])
            cat = lambda parts: PointVec(
                {
                    k: jnp.concatenate([p[k] for p in parts], axis=-1)
                    for k in ("x", "y", "z")
                }
            )
            return cat(his), cat(los)

        def take_batch(arr, idx):
            import jax.numpy as jnp

            return jnp.take(arr, idx, axis=arr.ndim - 1)

        def f(p: PointVec, tables) -> PointVec:
            import jax.tree_util as jtu
            import jax.numpy as jnp

            tw_arr, ev_idx, od_idx, perm, rev, scale_raw = tables
            x = PointVec(jtu.tree_map(lambda a: take_batch(a, rev), dict(p)))

            def stage(x, st):
                tw, ei, oi, pm = st
                even = PointVec(jtu.tree_map(lambda a: take_batch(a, ei), dict(x)))
                odd = PointVec(jtu.tree_map(lambda a: take_batch(a, oi), dict(x)))
                hi, lo = butterfly_bounded(even, odd, tw)
                cat = jtu.tree_map(
                    lambda a, b: take_batch(jnp.concatenate([a, b], axis=-1), pm),
                    dict(hi),
                    dict(lo),
                )
                return PointVec(cat), None

            x, _ = jax.lax.scan(stage, x, (tw_arr, ev_idx, od_idx, perm))
            return sm_bounded(x, scale_raw)

        return f

    # Above this size the whole-FFT program (lax.scan over stages) crashes
    # the v5e worker even with every butterfly group-op sliced to
    # MAX_SM_LANES (measured 2026-08-22: G2 OK at 2^16, worker crash at
    # 2^17). The staged path runs the SAME stage body as one compiled
    # program per stage (stage-uniform shapes -> a single compile reused
    # log2(n) times, arrays device-resident between calls) — each program
    # then owns only one stage's buffers.
    STAGE_SCAN_MAX = 1 << 16

    def _staged_call(self, inverse: bool):
        """Host-level stage loop twin of _traceable for n > STAGE_SCAN_MAX."""
        key = ("staged", inverse)
        if key not in self._jit_cache:
            ops = self.ops
            M = self.MAX_SM_LANES
            import jax.numpy as jnp
            import jax.tree_util as jtu

            def take_batch(arr, idx):
                return jnp.take(arr, idx, axis=arr.ndim - 1)

            def sm(pts: PointVec, tw):
                return ops.scalar_mul(pts, tw)

            def stage_body(x, tw, ei, oi, pm):
                even = PointVec(jtu.tree_map(lambda a: take_batch(a, ei), dict(x)))
                odd = PointVec(jtu.tree_map(lambda a: take_batch(a, oi), dict(x)))
                B = even["x"].shape[-1]
                his, los = [], []
                for lo_i in range(0, B, M):
                    ev = PointVec({k: v[..., lo_i : lo_i + M] for k, v in even.items()})
                    od = PointVec({k: v[..., lo_i : lo_i + M] for k, v in odd.items()})
                    t = sm(od, tw[..., lo_i : lo_i + M])
                    his.append(dict(ops.add(ev, t)))
                    los.append(dict(ops.add(ev, ops.neg(t))))
                cat = {
                    k: jnp.concatenate(
                        [p[k] for p in his] + [p[k] for p in los], axis=-1
                    )
                    for k in ("x", "y", "z")
                }
                return PointVec(
                    {k: take_batch(v, pm) for k, v in cat.items()}
                )

            def rev_body(x, rev):
                return PointVec(
                    jtu.tree_map(lambda a: take_batch(a, rev), dict(x))
                )

            def scale_body(x, scale_raw):
                B = x["x"].shape[-1]
                outs = [
                    dict(
                        sm(
                            PointVec({k: v[..., lo : lo + M] for k, v in x.items()}),
                            scale_raw[..., lo : lo + M],
                        )
                    )
                    for lo in range(0, B, M)
                ]
                return PointVec(
                    {
                        k: jnp.concatenate([o[k] for o in outs], axis=-1)
                        for k in ("x", "y", "z")
                    }
                )

            stage_jit = jax.jit(stage_body)
            rev_jit = jax.jit(rev_body)
            scale_jit = jax.jit(scale_body)
            tables = self._tables(inverse)[:6]
            dev = {"v": None}

            def call(p: PointVec) -> PointVec:
                if dev["v"] is None:
                    dev["v"] = jax.device_put(tables)
                tw_arr, ev_idx, od_idx, perm, rev, scale_raw = dev["v"]
                x = rev_jit(p, rev)
                for s in range(tw_arr.shape[0]):
                    x = stage_jit(x, tw_arr[s], ev_idx[s], od_idx[s], perm[s])
                return scale_jit(x, scale_raw)

            self._jit_cache[key] = call
        return self._jit_cache[key]

    def _get(self, inverse: bool):
        if inverse not in self._jit_cache:
            if self.n > self.STAGE_SCAN_MAX:
                self._jit_cache[inverse] = self._staged_call(inverse)
                return self._jit_cache[inverse]
            jf = jax.jit(self._traceable())
            tables = self._tables(inverse)[:6]
            dev = {"v": None}

            def call(p: PointVec) -> PointVec:
                if dev["v"] is None:
                    dev["v"] = jax.device_put(tables)
                return jf(p, dev["v"])

            self._jit_cache[inverse] = call
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
