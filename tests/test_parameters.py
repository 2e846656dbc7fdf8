"""Phase1Parameters geometry — byte-exact size formulas and iter_chunk
overlap semantics (reference parameters.rs:135-197, buffers.rs:22-73)."""

import pytest

from snark_setup_tpu.curves.constants import get_curve
from snark_setup_tpu.phase1.buffers import iter_chunk, split
from snark_setup_tpu.phase1.parameters import Phase1Parameters
from snark_setup_tpu.utils.enums import ContributionMode, ProvingSystem, UseCompression


def test_element_sizes_match_arkworks():
    # parameters.rs:312-317 asserted sizes
    for curve, g1u, g1c, g2u, g2c in [
        ("bls12_377", 96, 48, 192, 96),
        ("bls12_381", 96, 48, 192, 96),
        ("bw6_761", 192, 96, 192, 96),
    ]:
        s = get_curve(curve)
        assert (s.g1.uncompressed_size, s.g1.compressed_size) == (g1u, g1c)
        assert (s.g2.uncompressed_size, s.g2.compressed_size) == (g2u, g2c)


def test_groth16_sizes_bls12_377_power3():
    p = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, 3, 4)
    assert p.powers_length == 8
    assert p.powers_g1_length == 15
    # 15*96 + 8*(192 + 2*96) + 192 + 64
    assert p.accumulator_size == 4768
    # 15*48 + 8*(96 + 2*48) + 96 + 64 + pubkey(3*96 + 6*48)
    assert p.public_key_size == 576
    assert p.contribution_size == 2992
    assert p.get_length(UseCompression.NO) == p.accumulator_size
    assert p.get_length(UseCompression.YES) == p.contribution_size - p.public_key_size


def test_chunked_sizes_cover_full():
    full = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, 4, 4)
    chunk_size = 7
    total_g1 = 0
    total_other = 0
    for i in range(full.into_chunk_parameters(ContributionMode.CHUNKED, 0, chunk_size).num_chunks):
        c = full.into_chunk_parameters(ContributionMode.CHUNKED, i, chunk_size)
        total_g1 += c.g1_chunk_size
        total_other += c.other_chunk_size
    assert total_g1 == full.powers_g1_length
    assert total_other == full.powers_length


def test_iter_chunk_overlap():
    p = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, 3, 4)
    batches = iter_chunk(p)
    # consecutive batches share boundary elements (+1/+2 extension)
    for (s0, e0), (s1, e1) in zip(batches, batches[1:]):
        assert s1 < e0, "batches must overlap"
    # all indices covered
    assert batches[0][0] == 0
    assert batches[-1][1] == p.powers_g1_length


def test_iter_chunk_single_element_tail():
    # power 2 -> g1 length 7; batch 4 -> step 3: batches (0,5),(3,7),(6,7)?
    p = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, 2, 4)
    batches = iter_chunk(p)
    assert batches[0][0] == 0 and batches[-1][1] == 7
    for s, e in batches:
        assert e - s >= 2 or len(batches) == 1


def test_split_sections_contiguous():
    p = Phase1Parameters.new_full("bls12_377", ProvingSystem.GROTH16, 3, 4)
    for comp in (UseCompression.NO, UseCompression.YES):
        sec = split(p, comp)
        off = p.hash_size
        for name in ("tau_g1", "tau_g2", "alpha_g1", "beta_g1", "beta_g2"):
            assert sec[name].offset == off
            off = sec[name].end
        assert off == p.get_length(comp)


def test_marlin_geometry():
    p = Phase1Parameters.new_full("bls12_377", ProvingSystem.MARLIN, 4, 4)
    assert p.powers_length == 16
    assert p.g1_chunk_size == 16
    sec = split(p, UseCompression.NO)
    assert sec["tau_g2"].num_elements == 4 + 2
    assert sec["alpha_g1"].num_elements == 3 + 3 * 4
