"""QAP evaluation against phase-1 Lagrange coefficients — device kernels.

Reference: phase2/src/polynomial.rs (eval, dot products over sparse rows)
and process_matrix (phase2/src/parameters.rs:96-104). TPU-first design: all
sparse rows of a matrix are evaluated in ONE device call — gather the
referenced coefficient points, one batched constant-time scalar-mul by the
matrix coefficients, then a segmented Hillis–Steele scan with the group law
(log2(nnz) batched point-adds) that reduces each variable's row without any
data-dependent control flow.
"""

from __future__ import annotations

import jax
import numpy as np

from ..curves.host import INFINITY, AffinePoint
from ..fields.limb import ints_to_limbs_batch
from ..ops.curve_jax import CurveOps, PointVec, curve_ops


def process_matrix(
    rows: list[list[tuple[int, int]]], num_vars: int
) -> list[list[tuple[int, int]]]:
    """Constraint-major -> variable-major transpose
    (parameters.rs:96-104): out[var] = [(coeff, constraint_idx), ...]."""
    out: list[list[tuple[int, int]]] = [[] for _ in range(num_vars)]
    for constraint_num, entries in enumerate(rows):
        for coeff, var_index in entries:
            out[var_index].append((coeff, constraint_num))
    return out


def _flatten_rows(rows: list[list[tuple[int, int]]]):
    """-> (coeffs, idx, seg_starts_flags, seg_end_positions, row_of_segment)."""
    coeffs, idx, flags, ends, rows_present = [], [], [], [], []
    for row_i, entries in enumerate(rows):
        if not entries:
            continue
        for k, (c, j) in enumerate(entries):
            coeffs.append(c)
            idx.append(j)
            flags.append(k == 0)
        ends.append(len(coeffs) - 1)
        rows_present.append(row_i)
    return coeffs, idx, flags, ends, rows_present


_seg_cache: dict = {}


def _segmented_rowsum_jit(ops: CurveOps):
    """jit((points, gather_idx, scalars, flags, ends)) -> PointVec of row sums.

    Inclusive segmented scan, Hillis–Steele doubling: at step d each position
    combines with the position d to its left unless a segment boundary was
    already absorbed. Identity = (infinity, flag=False)."""
    key = id(ops)
    if key in _seg_cache:
        return _seg_cache[key]

    def f(points: PointVec, gidx, scalars, flags, ends):
        import jax.numpy as jnp
        import jax.tree_util as jtu

        gathered = PointVec(
            jtu.tree_map(lambda a: jnp.take(a, gidx, axis=a.ndim - 1), dict(points))
        )
        vals = ops.scalar_mul(gathered, scalars)
        n = int(gidx.shape[0])
        inf = ops.infinity((n,))
        d = 1
        while d < n:
            shifted_vals = PointVec(
                jtu.tree_map(
                    lambda a, b: jnp.concatenate(
                        [b[..., :d], a[..., :-d]], axis=-1
                    ),
                    dict(vals),
                    dict(inf),
                )
            )
            shifted_flags = jnp.concatenate(
                [np.zeros(d, bool), flags[:-d]], axis=0
            )
            summed = ops.add(shifted_vals, vals)
            vals = ops.select(flags, vals, summed)
            flags = flags | shifted_flags
            d <<= 1
        return PointVec(
            jtu.tree_map(lambda a: jnp.take(a, ends, axis=a.ndim - 1), dict(vals))
        )

    _seg_cache[key] = jax.jit(f)
    return _seg_cache[key]


def dot_product_vec(
    ops: CurveOps, coeff_points: list[AffinePoint], rows: list[list[tuple[int, int]]]
) -> list[AffinePoint]:
    """Per-row sparse dot products row_i = sum_k coeff * points[idx]
    (polynomial.rs:71-94), one device dispatch for the whole matrix."""
    coeffs, idx, flags, ends, rows_present = _flatten_rows(rows)
    out: list[AffinePoint] = [INFINITY] * len(rows)
    if not coeffs:
        return out
    pts_dev = ops.from_affine_host(coeff_points)
    raw = np.ascontiguousarray(ints_to_limbs_batch(coeffs, ops.fr.L).T)
    sums = _segmented_rowsum_jit(ops)(
        pts_dev,
        np.asarray(idx, np.int32),
        raw,
        np.asarray(flags, bool),
        np.asarray(ends, np.int32),
    )
    host = ops.to_affine_host(sums)
    for row_i, p in zip(rows_present, host):
        out[row_i] = p
    return out


def eval_qap(
    curve_name: str,
    coeffs_g1: list[AffinePoint],
    coeffs_g2: list[AffinePoint],
    alpha_coeffs_g1: list[AffinePoint],
    beta_coeffs_g1: list[AffinePoint],
    at: list[list[tuple[int, int]]],
    bt: list[list[tuple[int, int]]],
    ct: list[list[tuple[int, int]]],
    num_inputs: int,
):
    """Returns (a_g1, b_g1, b_g2, gamma_abc_g1, l) — polynomial.rs:11-47.

    ext = At·beta_coeffs + Bt·alpha_coeffs + Ct·coeffs, split at num_inputs
    into gamma_abc_g1 (instance) and l (witness)."""
    g1 = curve_ops(curve_name, "g1")
    g2 = curve_ops(curve_name, "g2")
    a_g1 = dot_product_vec(g1, coeffs_g1, at)
    b_g1 = dot_product_vec(g1, coeffs_g1, bt)
    b_g2 = dot_product_vec(g2, coeffs_g2, bt)

    # ext: concatenate the three flattened systems into one segmented scan by
    # summing three per-variable partials on host (3 adds per variable)
    ext_a = dot_product_vec(g1, beta_coeffs_g1, at)
    ext_b = dot_product_vec(g1, alpha_coeffs_g1, bt)
    ext_c = dot_product_vec(g1, coeffs_g1, ct)
    hc = g1.host_curve
    ext = [hc.add(hc.add(x, y), z) for x, y, z in zip(ext_a, ext_b, ext_c)]

    gamma_abc_g1 = ext[:num_inputs]
    l = ext[num_inputs:]
    return a_g1, b_g1, b_g2, gamma_abc_g1, l
