#!/usr/bin/env python
"""Fraction-of-speed-of-light analysis for the batch_exp hot kernel
(BASELINE.md north-star requirement; VERDICT r1 #7).

Counts base-field (Fq) Montgomery multiplications per G1 exponentiation in
the GLV fixed-window ladder actually implemented in ops/curve_jax.py, then
derives the achievable exp/s from the chip's integer-multiply throughput
and the 16-bit-limb schoolbook cost, and compares to the measured rate.

All counts are exact graph counts (stacked-mul rounds as implemented),
not textbook formulas. Usage: run on any backend; pass the measured
exp/s (from bench.py) as argv[1] to print the fraction.
"""

import json
import sys

# --- per-group-op Fq-mul counts as implemented (curve_jax.py) -------------
# RCB complete add (a=0 path): round0 = 6 products, round1 = 2, round2 = 6
ADD_MULS = 14
# dedicated a=0 doubling: round0 = 4, round1 = 1, round2 = 4
DBL_MULS = 9

# --- GLV w=4 ladder shape (scalar_mul for BLS12-377 G1) -------------------
W = 4
GLV_BITS = 129  # half-width sub-scalar bound (lattice decomposition)
NWIN = -(-GLV_BITS // W)  # 33 windows
# per window: W doublings + 2 table adds (one per sub-scalar)
LADDER_MULS = NWIN * (W * DBL_MULS + 2 * ADD_MULS)
# table build: double + 13 adds, plus the phi-table coefficient mul (16)
TABLE_MULS = DBL_MULS + 13 * ADD_MULS + 16
# GLV decompose: ~8 Fr muls (rounding + recompose) — counted as Fq-ish
DECOMP_MULS = 8
MULS_PER_EXP = LADDER_MULS + TABLE_MULS + DECOMP_MULS

# --- Fq mul cost in u32 MAC-equivalents (24 x 16-bit limbs) ---------------
L = 24
# schoolbook product table L^2 MACs, REDC: m = t_low*N' (~L^2/2) + m*N (L^2),
# plus carry/merge vector ops ~ 1.5 L^2 equivalent
MACS_PER_MUL = int(L * L * (1 + 0.5 + 1 + 1.5))

# --- chip integer throughput (documented estimates) -----------------------
# TPU v5e VPU: 4 MXUs are bf16-only; int path runs on the VPU:
# 8 sublanes x 128 lanes x ~2 ops/cycle x ~0.94 GHz ~= 1.9e12 u32 ops/s.
# Multiplies are ~1/2 rate vs adds -> ~1e12 MAC/s usable estimate.
CHIP_INT_MACS_PER_S = 1.0e12


def main():
    sol_exp_per_s = CHIP_INT_MACS_PER_S / (MULS_PER_EXP * MACS_PER_MUL)
    out = {
        "muls_per_exp": MULS_PER_EXP,
        "macs_per_mul": MACS_PER_MUL,
        "chip_int_macs_per_s": CHIP_INT_MACS_PER_S,
        "speed_of_light_exp_per_s": round(sol_exp_per_s),
    }
    if len(sys.argv) > 1:
        measured = float(sys.argv[1])
        out["measured_exp_per_s"] = measured
        out["fraction_of_sol"] = round(measured / sol_exp_per_s, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
