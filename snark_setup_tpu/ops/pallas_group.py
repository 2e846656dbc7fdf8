"""Fused single-group-op Pallas kernels: one kernel per complete group
double / add, with ALL field glue (adds, subs, negs, small multiples) done
in VMEM instead of as XLA elementwise HLO between stacked-mul launches.

Motivation (measured, BASELINE.md r3): at batch 16k an XLA-level field add
costs ~0.227 ms — ~1.5x an entire in-kernel limb product — because every
elementwise HLO streams (L, B) uint32 planes through HBM. A group double is
3 stacked-mul pallas launches PLUS ~8 such glue ops; a complete add is 3
launches plus ~15. These kernels collapse each group op to ONE launch whose
only HBM traffic is the input and output coordinates.

This sits between the per-round stacked kernel (pallas_field.py — fuses one
multiplication round) and the whole-ladder kernel (pallas_ladder.py — fuses
everything including the window table, measured SLOWER because the
VMEM-resident table and Mosaic-scheduled outer loop beat XLA's inter-op
pipelining). Here XLA still schedules between group ops, so table selects
and scan structure keep their XLA codegen, but no field-element glue ever
leaves VMEM.

Scope: degree-1 coordinate fields with a=0 (G1 of BLS12-377/381 and both
groups of BW6-761) — same scope as the fused ladder. Group law identical to
curve_jax.CurveOps (RCB complete formulas, eprint 2015/1060 Alg. 7/9);
parity with the stacked-round path is locked by tests/test_pallas_group.py.

Replaces the hot group ops of batch_exp (reference setup-utils/src/
helpers.rs:75-140) when enabled.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_ladder import _b3s_for, _kadd, _kdbl


def group_fused_enabled() -> bool:
    """Gate for the fused group-op kernels (SNARK_SETUP_GROUP_FUSED=1/0).
    'auto' = on for TPU backends: measured on v5e (benches/groupop_ab.py,
    batch 16k, 2026-08-21) dbl 2.29x, add 3.03x, full GLV ladder 1.22x
    (48.0k -> 58.5k exp/s), host-oracle-verified. Off on CPU, where the
    jnp column path compiles far faster for tests."""
    flag = os.environ.get("SNARK_SETUP_GROUP_FUSED", "auto")
    if flag in ("1", "on", "true"):
        return True
    if flag in ("0", "off", "false"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


class PallasGroupOps:
    """Fused double/add kernels for one degree-1 a=0 CurveOps."""

    TILE_B = 256
    TILE_B_ADD = 128
    """The add's widest lane-stacked round is 6-wide (vs the double's 4);
    at tile 256 that is a 1536-lane working set and the kernel measured
    ~2.75x a double against a ~1.5x op-count ratio. Tile 128 won every
    paired bench.py A/B on v5e (2026-08-22: 76k/60k/81k exp/s vs
    69k/55k/53k at 256) — the 768-lane working set keeps the 6-wide
    rounds out of spill territory."""

    def __init__(self, ops):
        assert ops.field.degree == 1 and ops.a_is_zero
        self.ops = ops
        fq = ops.fq
        self.L = fq.L
        self.N_col = np.asarray(fq.N, np.uint32)  # (L, 1)
        self.Np_col = np.asarray(fq.Nprime, np.uint32)
        self.b3_col = np.asarray(ops.b3_dev, np.uint32).reshape(self.L, 1)
        self.one_col = np.asarray(fq.one_mont_np, np.uint32)
        self.b3s = _b3s_for(ops)
        self._cache = {}

    def tile_b(self, kind: str = "dbl") -> int:
        """Batch-tile width, per op kind: the add's lane-stacked rounds are
        6 wide (vs the double's 4), so its VMEM/vreg working set at a given
        tile is 1.5x the double's — the optimum can differ.
        SNARK_SETUP_GROUP_TILE_B sets both; _ADD/_DBL override per kind."""
        default = self.TILE_B_ADD if kind == "add" else self.TILE_B
        base = os.environ.get("SNARK_SETUP_GROUP_TILE_B", str(default))
        return int(os.environ.get(f"SNARK_SETUP_GROUP_TILE_B_{kind.upper()}", base))

    def _make_dbl_kernel(self):
        L = self.L

        def kernel(x_ref, y_ref, z_ref, n_ref, np_ref, b3_ref, one_ref,
                   ox_ref, oy_ref, oz_ref):
            TB = x_ref.shape[-1]
            N_b = n_ref[:]
            Np_b = np_ref[:]
            b3_b = b3_ref[:]
            # widest stacked round in _kdbl is 4 lanes
            NS = jnp.concatenate([N_b] * 4, axis=-1)
            NpS = jnp.concatenate([Np_b] * 4, axis=-1)
            x3, y3, z3 = _kdbl(
                (x_ref[:], y_ref[:], z_ref[:]), N_b, Np_b, b3_b, NS, NpS, TB,
                self.b3s,
            )
            ox_ref[:] = x3
            oy_ref[:] = y3
            oz_ref[:] = z3

        return kernel

    def _make_add_kernel(self):
        L = self.L

        def kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                   n_ref, np_ref, b3_ref, one_ref,
                   ox_ref, oy_ref, oz_ref):
            TB = x1_ref.shape[-1]
            N_b = n_ref[:]
            Np_b = np_ref[:]
            b3_b = b3_ref[:]
            # widest stacked round in _kadd is 6 lanes
            NS = jnp.concatenate([N_b] * 6, axis=-1)
            NpS = jnp.concatenate([Np_b] * 6, axis=-1)
            x3, y3, z3 = _kadd(
                (x1_ref[:], y1_ref[:], z1_ref[:]),
                (x2_ref[:], y2_ref[:], z2_ref[:]),
                N_b, Np_b, b3_b, NS, NpS, TB, self.b3s,
            )
            ox_ref[:] = x3
            oy_ref[:] = y3
            oz_ref[:] = z3

        return kernel

    def _call_for(self, kind: str, Bp: int, TB: int, interpret: bool):
        from jax.experimental import pallas as pl

        L = self.L
        key = (kind, Bp, TB, interpret)
        if key not in self._cache:
            coord = pl.BlockSpec((L, TB), lambda i: (0, i))
            const = pl.BlockSpec((L, TB), lambda i: (0, 0))
            n_in = 3 if kind == "dbl" else 6
            kernel = (
                self._make_dbl_kernel() if kind == "dbl" else self._make_add_kernel()
            )
            self._cache[key] = pl.pallas_call(
                kernel,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((L, Bp), jnp.uint32) for _ in range(3)
                ),
                grid=(Bp // TB,),
                in_specs=[coord] * n_in + [const] * 4,
                out_specs=(coord, coord, coord),
                interpret=interpret,
            )
        return self._cache[key]

    def _tile(self, c, TB):
        return np.ascontiguousarray(np.broadcast_to(c, (self.L, TB)))

    def _run(self, kind: str, coords, interpret: bool):
        B = coords[0].shape[-1]
        TB = min(self.tile_b(kind), max(128, B))
        Bp = -(-B // TB) * TB
        if Bp != B:
            pad = Bp - B
            padded = []
            for i, c in enumerate(coords):
                if i % 3 == 1:  # y-coords pad with one (infinity convention)
                    c = jnp.concatenate(
                        [c, jnp.broadcast_to(self.one_col, (self.L, pad))], axis=-1
                    )
                else:
                    c = jnp.pad(c, [(0, 0), (0, pad)])
                padded.append(c)
            coords = padded
        call = self._call_for(kind, Bp, TB, interpret)
        consts = [
            self._tile(self.N_col, TB),
            self._tile(self.Np_col, TB),
            self._tile(self.b3_col, TB),
            self._tile(self.one_col, TB),
        ]
        ox, oy, oz = call(*coords, *consts)
        if Bp != B:
            ox, oy, oz = ox[:, :B], oy[:, :B], oz[:, :B]
        return ox, oy, oz

    def double(self, p, interpret: bool = False):
        from .curve_jax import PointVec

        ox, oy, oz = self._run("dbl", [p["x"], p["y"], p["z"]], interpret)
        return PointVec(x=ox, y=oy, z=oz)

    def add(self, p, q, interpret: bool = False):
        from .curve_jax import PointVec

        B = p["x"].shape[-1]
        qc = [jnp.broadcast_to(q[k], (self.L, B)) for k in ("x", "y", "z")]
        ox, oy, oz = self._run(
            "add", [p["x"], p["y"], p["z"], *qc], interpret
        )
        return PointVec(x=ox, y=oy, z=oz)


@functools.lru_cache(maxsize=None)
def group_ops_for(curve_name: str, group: str) -> PallasGroupOps:
    from .curve_jax import curve_ops

    return PallasGroupOps(curve_ops(curve_name, group))


def group_fused_available(ops) -> bool:
    return ops.field.degree == 1 and ops.a_is_zero
