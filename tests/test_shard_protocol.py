"""Multi-device mesh wiring of the ceremony engine (VERDICT r4 #1).

Runs the SAME seeded contribution + verification twice — once single-device,
once with the batch axis sharded over the 8-virtual-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8) — and asserts the
produced response and new-challenge files are byte-identical. This is the
production analog of the reference's multi-worker chunking
(phase1/src/aggregation.rs:11-352), applied inside one participant via
jax.sharding instead of files.
"""

import random

import pytest

from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.phase1.protocol import Phase1
from snark_setup_tpu.phase1.testing import generate_output, setup_verify
from snark_setup_tpu.shard import runtime
from snark_setup_tpu.utils.enums import (
    CheckForCorrectness,
    ProvingSystem,
    SubgroupCheckMode,
    UseCompression,
)

POWER = 3
BATCH = 4


@pytest.fixture
def sharded_env(monkeypatch):
    """Activate mesh sharding (opt-in on CPU backends) for one test."""
    monkeypatch.setenv("SNARK_SETUP_SHARD", "1")
    runtime.reset_mesh_cache()
    yield
    monkeypatch.delenv("SNARK_SETUP_SHARD", raising=False)
    runtime.reset_mesh_cache()


def _run_ceremony():
    """Seeded contribute + verify; returns (response_bytes, new_challenge)."""
    params = Phase1Parameters.new_full(
        "bls12_377", ProvingSystem.GROTH16, POWER, BATCH
    )
    inp, out, pubkey, privkey, digest = setup_verify(
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.YES, params
    )
    new_challenge = generate_output(params, UseCompression.NO)
    Phase1.verification(
        inp, out, new_challenge, pubkey, digest,
        UseCompression.NO, UseCompression.YES, UseCompression.NO,
        CheckForCorrectness.NO, CheckForCorrectness.FULL,
        SubgroupCheckMode.AUTO, True, params, rlc_rng=random.Random(7),
    )
    return bytes(out), bytes(new_challenge)


def test_mesh_activates_on_optin(sharded_env):
    mesh = runtime.active_mesh()
    assert mesh is not None, "8-virtual-device conftest mesh should activate"
    assert runtime.mesh_size() == 8
    # pads round up to shard evenly
    assert runtime.pad_width(BATCH + 1) % 8 == 0


def test_mesh_off_by_default_on_cpu():
    runtime.reset_mesh_cache()
    assert runtime.active_mesh() is None
    assert runtime.pad_width(BATCH + 1) == BATCH + 1
    runtime.reset_mesh_cache()


def test_sharded_ceremony_bytes_identical(sharded_env):
    sharded = _run_ceremony()
    runtime.reset_mesh_cache()
    import os

    os.environ["SNARK_SETUP_SHARD"] = "0"
    try:
        single = _run_ceremony()
    finally:
        os.environ["SNARK_SETUP_SHARD"] = "1"
        runtime.reset_mesh_cache()
    assert sharded[0] == single[0], "response bytes differ under sharding"
    assert sharded[1] == single[1], "new challenge differs under sharding"
