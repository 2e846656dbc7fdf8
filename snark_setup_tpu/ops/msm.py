"""Shared MSM policy for PUBLIC (verifier-side) scalars.

One chooser used by phase-1 RLC power-pair checks, the batched subgroup
check, and phase-2 merge-pairs: Pippenger buckets (ops/pippenger.py) above
PIPPENGER_MIN points, a width-bounded windowed ladder + tree reduce below
(one fused compile, cheap for the per-batch shapes tests use).

Secret-scalar paths (contribution, key material) must NOT come through
here — they use the constant-time GLV ladder in curve_jax.py.

Replaces msm_bigint inside merge_pairs (setup-utils/src/helpers.rs:371-384)
and the reference's dead hand-rolled Pippenger (helpers.rs:447-548).
"""

from __future__ import annotations

import os
import secrets

import numpy as np

from ..fields.limb import LIMB_BITS, ints_to_limbs_batch
from .curve_jax import CurveOps, PointVec

RLC_BITS = 128
"""Width of random-linear-combination scalars. The reference draws full
Fr-width scalars from thread_rng (helpers.rs:373-376); soundness only needs
the ~2^-128 collision bound, and half width halves both ladder length and
Pippenger window count. Scalars stay injectable for reproducible tests."""

PIPPENGER_MIN = 1 << 9
"""Batch size above which public-scalar MSMs switch from the windowed
ladder to the Pippenger bucket kernel: below this the ladder's single fused
compile is cheaper than the bucket machinery."""


def rlc_scalars(n: int, bits: int = RLC_BITS, rng=None) -> np.ndarray:
    """n random `bits`-wide scalars as raw 16-bit limb planes (Ls, n)."""
    L = -(-bits // LIMB_BITS)
    if rng is None:
        vals = [secrets.randbits(bits) for _ in range(n)]
    else:
        vals = [rng.randrange(1 << bits) for _ in range(n)]
    return np.ascontiguousarray(ints_to_limbs_batch(vals, L).T)


def rlc_scalars_padded(n: int, pad: int, bits: int = RLC_BITS, rng=None) -> np.ndarray:
    """n random scalars zero-padded to `pad` rows (padding rows multiply
    padding infinity points, contributing the identity to the MSM)."""
    out = rlc_scalars(n, bits, rng)
    if pad > n:
        out = np.concatenate(
            [out, np.zeros((out.shape[0], pad - n), np.uint32)], axis=1
        )
    return out


_ladder_cache: dict = {}
_secret_cache: dict = {}


def msm_secret(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray) -> PointVec:
    """MSM for SECRET scalars (prover witness, key material): the
    constant-time GLV ladder + tree reduce. No host digit recoding, no
    data-dependent bucket gathers, no zero-scalar skipping — every scalar
    does identical work, so timing and memory traffic are independent of
    the witness. Bases must lie in the prime-order subgroup (GLV contract).

    The jit is compiled with the persistent compilation cache disabled:
    serializing this particular executable segfaults XLA:CPU (jax 0.9,
    compilation_cache.py:265) — the cache is only toggled off around the
    first (compiling) call per (ops, shape) signature.

    CPU backends fall back to exact HOST math: each new shape otherwise
    forces another deep XLA:CPU ladder compile, and after ~10 of those
    per process the compiler hits allocator corruption (see
    host_fallback_enabled). The host path is NOT constant-time (python
    bigints) — acceptable because the CPU-backend prover only serves the
    acceptance tests; the production TPU path keeps the constant-time
    GLV ladder."""
    if host_fallback_enabled():
        return _host_msm(ops, pts, scalars_raw)
    import jax

    from .jax_setup import no_persistent_cache

    key = (id(ops), pts["x"].shape, scalars_raw.shape)
    if key in _secret_cache:
        return PointVec(_secret_cache[key](pts, scalars_raw))

    f = jax.jit(lambda p, s: dict(ops.sum_reduce(ops.scalar_mul(p, s))))
    with no_persistent_cache():
        out = f(pts, scalars_raw)
    _secret_cache[key] = f
    return PointVec(out)


def host_fallback_enabled() -> bool:
    """On CPU backends the small-batch device paths go through exact HOST
    math instead: XLA:CPU's compiler segfaults nondeterministically on the
    deep windowed-ladder executables (backend_compile_and_load, process-
    state dependent — survives ulimit -s 262144), and even when it
    succeeds the compile costs minutes for work the host does in
    milliseconds at these sizes. SNARK_SETUP_FORCE_DEVICE_MSM=1 restores
    the device path for kernel A/Bs. TPU backends are unaffected."""
    import jax

    if os.environ.get("SNARK_SETUP_FORCE_DEVICE_MSM", "0") in ("1", "on", "true"):
        return False
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return False


def _host_msm(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray) -> PointVec:
    """Exact host-bigint MSM (verifier-side small batches on CPU)."""
    from ..curves.host import INFINITY
    from ..fields.limb import limbs_batch_to_ints

    aff = ops.to_affine_host(pts)
    ks = limbs_batch_to_ints(np.asarray(scalars_raw).T)
    hc = ops.host_curve
    acc = INFINITY
    for p, k in zip(aff, ks):
        if k and not p.is_infinity:
            acc = hc.add(acc, hc.mul(p, k))
    return ops.from_affine_host([acc])


def msm_public(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray, nbits: int) -> PointVec:
    """MSM over public scalars; returns a 1-point device PointVec."""
    B = int(pts["x"].shape[-1])
    if B >= PIPPENGER_MIN:
        from .pippenger import pippenger_for

        pip = pippenger_for(ops.spec.name, ops.group_name, B, nbits)
        return pip(pts, scalars_raw)
    if host_fallback_enabled():
        return _host_msm(ops, pts, scalars_raw)
    import jax

    # Key includes the INPUT SHAPES: jit recompiles per shape, and every
    # compile of this ladder must run under no_persistent_cache —
    # serializing the compiled executable segfaults XLA:CPU (jax 0.9,
    # compilation_cache.py:265 on write / :238 on a later read of the
    # poisoned entry). A shape-free key left repeat calls recompiling on
    # the unguarded path (crash reproduced at exactly that line).
    key = (id(ops), nbits, pts["x"].shape, scalars_raw.shape)
    if key not in _ladder_cache:

        def f(p, s):
            prods = ops.scalar_mul_windowed(p, s, nbits=nbits)
            return dict(ops.sum_reduce(prods))

        fn = jax.jit(f)
        from .jax_setup import no_persistent_cache

        with no_persistent_cache():
            out = fn(pts, scalars_raw)
        _ladder_cache[key] = fn
        return PointVec(out)
    return PointVec(_ladder_cache[key](pts, scalars_raw))
