"""Phase 2 — Groth16 specialization MPC over the delta trapdoor.

Mirrors the reference `phase2` crate (phase2/src/*): MPCParameters over an
ark-groth16-layout ProvingKey, a per-contribution signature-of-knowledge
transcript, QAP evaluation against phase-1 Lagrange coefficients, and a
streaming (chunked) mode for parameter sets that exceed memory. The compute
hot paths — Lagrange IFFT, QAP sparse dot products, delta^-1 batch
multiplication, RLC ratio-check MSMs — run on TPU.
"""

from .keypair import Keypair, Phase2PublicKey, hash_cs_pub_keys
from .lagrange import Groth16Params
from .load_circuit import Matrices
from .parameters import MPCParameters, ProvingKey, VerifyingKey, verify_transcript

__all__ = [
    "Keypair",
    "Phase2PublicKey",
    "hash_cs_pub_keys",
    "Groth16Params",
    "Matrices",
    "MPCParameters",
    "ProvingKey",
    "VerifyingKey",
    "verify_transcript",
]
