"""snark_setup_tpu — a TPU-native trusted-setup (powers-of-tau / Groth16 MPC) engine.

A from-scratch rebuild of the capabilities of nimiq/snark-setup (Rust, see
/root/reference) designed TPU-first:

- the compute core (multi-limb Montgomery field arithmetic, curve group law,
  batch fixed-base exponentiation, Pippenger MSM, group-element NTT) runs as
  JAX/XLA programs and Pallas kernels over 16-bit limb planes;
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` over the
  accumulator index range (the i of tau^i), with collectives for MSM bucket
  reduction and NTT butterflies;
- the protocol layer (challenge/response files, Blake2b hash chain,
  arkworks-compatible wire encodings) is reproduced bit-exactly on the host.

Layer map (mirrors SURVEY.md §1 of the reference):
  L1: fields/ curves/  — math core           (reference: arkworks ark-ec/ark-ff)
  L2: serialize/ transcript/ utils/          (reference: setup-utils)
  L3: phase1/ phase2/ ntt/                   (reference: phase1, phase2 crates)
  L4: cli/                                   (reference: phase1-cli, phase2-cli)
  L5: scripts/                               (reference: shell ceremony drivers)
  shard/  — TPU mesh + i-range partitioning  (reference: rayon/chunking)
  ops/    — Pallas TPU kernels for hot loops
"""

__version__ = "0.1.0"
