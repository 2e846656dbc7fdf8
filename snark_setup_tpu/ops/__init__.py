"""Device (TPU) kernels: multi-limb Montgomery field arithmetic, curve group
law, batch exponentiation, MSM, and NTT — the hot loops of the ceremony.

Structure:
    fp_jax.py     — vectorized XLA limb arithmetic (the portable baseline)
    curve_jax.py  — complete projective group law + batch scalar-mul + MSM
    fp_pallas.py  — Pallas TPU kernels for the inner field ops (hot path)
"""

from .jax_setup import configure_jax

configure_jax()

from .fp_jax import FpOps
from .curve_jax import CurveOps

__all__ = ["FpOps", "CurveOps", "configure_jax"]
