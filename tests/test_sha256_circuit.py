"""SHA-256 preimage circuit: satisfiability + digest binding (no device
work — pure R1CS checks, the gadget analog of ark's Sha256 gadget tests)."""

import hashlib
import secrets

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.phase2.r1cs import ConstraintSystem
from snark_setup_tpu.phase2.sha256_circuit import TestHashCircuit, pack_digest


def _satisfied(cs, z):
    a, b, c = cs.to_matrices()
    r = cs.r
    for ra, rb, rc in zip(a, b, c):
        va = sum(co * z[i] for co, i in ra) % r
        vb = sum(co * z[i] for co, i in rb) % r
        vc = sum(co * z[i] for co, i in rc) % r
        if va * vb % r != vc:
            return False
    return True


def test_sha256_circuit_satisfiable():
    spec = get_curve("bls12_377")
    pre = secrets.token_bytes(32)
    circuit = TestHashCircuit(pre)
    cs = ConstraintSystem(spec.r, setup=False)
    circuit.generate_constraints(cs)
    assert _satisfied(cs, cs.full_assignment())
    assert circuit.public_inputs(spec.r) == cs.instance_assignment[1:]
    # setup-mode synthesis has identical geometry
    cs2 = ConstraintSystem(spec.r, setup=True)
    TestHashCircuit(b"\0" * 32).generate_constraints(cs2)
    assert cs2.num_constraints == cs.num_constraints
    assert cs2.num_witness_variables == cs.num_witness_variables
    assert cs2.num_instance_variables == cs.num_instance_variables


def test_sha256_circuit_rejects_wrong_digest():
    spec = get_curve("bls12_377")
    pre = secrets.token_bytes(32)
    circuit = TestHashCircuit(pre)
    cs = ConstraintSystem(spec.r, setup=False)
    circuit.generate_constraints(cs)
    z = cs.full_assignment()
    # tamper with the public digest
    wrong = pack_digest(spec.r, hashlib.sha256(b"not the preimage").digest())
    z_bad = [z[0]] + wrong + z[cs.num_instance_variables :]
    assert not _satisfied(cs, z_bad)
