"""Phase 1 protocol operations over raw byte buffers, TPU-accelerated.

Buffer-oriented API mirroring the reference's `Phase1` static methods
(phase1/src/{initialization,computation,verification,aggregation}.rs): every
operation takes `&[u8]`-style buffers so the CLI can hand it mmaps and tests
can hand it bytearrays — the reference's key testability trick (SURVEY §4).

The hot loops run on TPU:
- computation: per overlapping batch, powers tau^i are generated on device
  (32-step vectorized pow) and applied with batched constant-time
  scalar-muls, then batch-normalized + recompressed on device.
- verification: per batch, nonzero/subgroup checks and the
  random-linear-combination power-pair MSMs run on device; only the O(1)
  pairing ratio checks are evaluated on host. Verification doubles as
  decompression: each verified batch is written into the new challenge.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..curves.host import AffinePoint, g1_curve, g2_curve
from ..curves.pairing import pairing_engine
from ..fields.limb import ints_to_limbs_batch
from ..ops.codec_jax import BatchPointCodec, batch_codec
from ..ops.curve_jax import CurveOps, PointVec, curve_ops
from ..serialize.arkworks import g1_codec, g2_codec
from ..transcript.hashing import blank_hash, compute_g2_s
from ..utils.enums import (
    BatchExpMode,
    CheckForCorrectness,
    ContributionMode,
    ElementType,
    ProvingSystem,
    SubgroupCheckMode,
    UseCompression,
)
from ..utils.errors import (
    BatchTooSmallError,
    Error,
    IncorrectSubgroupError,
    InvalidGeneratorError,
    InvalidRatioError,
)
from ..utils.tracing import get_logger, info_span
from .buffers import Section, iter_chunk, split, split_at_chunk
from .keys import PrivateKey, PublicKey, key_generation
from .parameters import Phase1Parameters

logger = get_logger("snark_setup_tpu.phase1")


def _chunk_rel(parameters: Phase1Parameters, start: int, end: int) -> tuple[int, int]:
    if parameters.contribution_mode is ContributionMode.CHUNKED:
        base = parameters.chunk_index * parameters.chunk_size
        return start - base, end - base
    return start, end


# Public-scalar MSM policy (RLC width, Pippenger threshold, scalar
# generation) is shared with phase 2 — see ops/msm.py.
from ..ops.msm import (  # noqa: E402
    RLC_BITS,
    msm_public as _msm_device,
    rlc_scalars_padded as _rng_scalars_padded,
)


def _scalar_mul_jit(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray):
    """Batch scalar-mul through the mesh runtime: sharded over all visible
    devices when a multi-device mesh is active (shard/runtime.py), a plain
    single-device jit otherwise."""
    from ..shard import runtime

    pts = runtime.put_points(ops, pts)
    scalars_raw = runtime.put_scalars(ops, scalars_raw)
    return runtime.scalar_mul(ops, pts, scalars_raw)


def _shard_pad(pad: int) -> int:
    """Batch pad width, rounded up so the batch axis shards evenly over an
    active mesh (identity single-device)."""
    from ..shard import runtime

    return runtime.pad_width(pad)


class Phase1:
    """Container mirroring the reference Phase1 struct (host points); the
    static protocol methods operate directly on buffers."""

    def __init__(
        self,
        tau_powers_g1,
        tau_powers_g2,
        alpha_tau_powers_g1,
        beta_tau_powers_g1,
        beta_g2,
        hash_bytes,
        parameters,
    ):
        self.tau_powers_g1 = tau_powers_g1
        self.tau_powers_g2 = tau_powers_g2
        self.alpha_tau_powers_g1 = alpha_tau_powers_g1
        self.beta_tau_powers_g1 = beta_tau_powers_g1
        self.beta_g2 = beta_g2
        self.hash = hash_bytes
        self.parameters = parameters

    def __eq__(self, other):
        return (
            self.tau_powers_g1 == other.tau_powers_g1
            and self.tau_powers_g2 == other.tau_powers_g2
            and self.alpha_tau_powers_g1 == other.alpha_tau_powers_g1
            and self.beta_tau_powers_g1 == other.beta_tau_powers_g1
            and self.beta_g2 == other.beta_g2
        )

    # ------------------------------------------------------------------
    # Key generation (phase1/src/key_generation.rs)
    # ------------------------------------------------------------------
    @staticmethod
    def key_generation(spec, rng, digest: bytes):
        return key_generation(spec, rng, digest)

    # ------------------------------------------------------------------
    # Initialization (phase1/src/initialization.rs:12-56)
    # ------------------------------------------------------------------
    @staticmethod
    def initialization(
        output: bytearray,
        compressed_output: UseCompression,
        parameters: Phase1Parameters,
    ) -> None:
        with info_span("phase1-initialization", logger):
            spec = parameters.spec
            sections = split(parameters, compressed_output)
            gen_bytes = {
                "g1": g1_codec(spec).serialize(g1_curve(spec).generator, compressed_output),
                "g2": g2_codec(spec).serialize(g2_curve(spec).generator, compressed_output),
            }
            out = np.frombuffer(memoryview(output), np.uint8)
            for name, sec in sections.items():
                if sec.num_elements == 0:
                    continue
                g = gen_bytes["g2"] if name in ("tau_g2", "beta_g2") else gen_bytes["g1"]
                tile = np.tile(np.frombuffer(g, np.uint8), sec.num_elements)
                out[sec.offset : sec.end] = tile

    # ------------------------------------------------------------------
    # Computation / contribute (phase1/src/computation.rs:16-308)
    # ------------------------------------------------------------------
    @staticmethod
    def computation(
        input_buf,
        output: bytearray,
        compressed_input: UseCompression,
        compressed_output: UseCompression,
        check_input_for_correctness: CheckForCorrectness,
        batch_exp_mode: BatchExpMode,
        key: PrivateKey,
        parameters: Phase1Parameters,
    ) -> None:
        with info_span("phase1-computation", logger):
            spec = parameters.spec
            sec_in = split(parameters, compressed_input)
            sec_out = split(parameters, compressed_output)
            g1ops = curve_ops(spec.name, "g1")
            g2ops = curve_ops(spec.name, "g2")
            c1 = batch_codec(spec.name, "g1")
            c2 = batch_codec(spec.name, "g2")
            fr = g1ops.fr

            # Bounded dispatch pipeline: scalar-muls for up to PIPELINE_DEPTH
            # batches stay in flight on device; the write-back conversion is
            # dispatched immediately and its device->host copies started
            # ASYNC (write_batch_start), so the tunnel transfer of batch i
            # overlaps the compute of batches i+1.. — flush only does the
            # host-side byte packing on already-landed numpy data.
            PIPELINE_DEPTH = 4
            pending: list[tuple] = []

            def flush(limit: int = 0) -> None:
                while len(pending) > limit:
                    codec, section_out, sc, ec, parts, n = pending.pop(0)
                    out_bytes = codec.write_batch_finish(
                        parts, compressed_output, n_valid=n
                    )
                    section_out.slice_of(output, sc, ec)[:] = out_bytes

            def apply_powers(
                codec: BatchPointCodec,
                section_out: Section,
                section_in: Section,
                sc: int,
                ec: int,
                exp_ints: list[int] | None,
                exp_range: tuple[int, int] | None,
                coeff: int | None,
            ):
                """Read [sc,ec) of section, raise to powers, enqueue the
                write-back. Powers come either from explicit host ints
                (exp_ints) or a device-generated tau^i range
                (exp_range=(start,end)). All batches are padded to one fixed
                shape per section so jitted kernels compile once (and so the
                batch axis shards evenly over an active device mesh)."""
                n = ec - sc
                pad = _shard_pad(parameters.batch_size + 1)
                pts = codec.read_batch(
                    bytes(section_in.slice_of(input_buf, sc, ec)),
                    compressed_input,
                    check_input_for_correctness,
                    pad_to=pad,
                )
                if exp_ints is not None:
                    vals = list(exp_ints[:n]) + [0] * (pad - n)
                    if coeff is not None:
                        vals = [v * coeff % spec.r for v in vals]
                    raw = np.ascontiguousarray(ints_to_limbs_batch(vals, fr.L).T)
                else:
                    s, e = exp_range
                    raw = _tau_powers_raw(fr, key.tau, s, s + pad, coeff, as_numpy=False)
                prod = _scalar_mul_jit(codec.ops, pts, raw)
                parts = codec.write_batch_start(prod)
                pending.append((codec, section_out, sc, ec, parts, n))
                flush(limit=PIPELINE_DEPTH - 1)

            if parameters.proving_system is ProvingSystem.GROTH16:
                # beta_g2 single element
                hb = g2_codec(spec)
                beta_el = hb.deserialize(
                    bytes(sec_in["beta_g2"].slice_of(input_buf, 0, 1)),
                    compressed_input,
                    check_input_for_correctness,
                )
                beta_el = g2_curve(spec).mul(beta_el, key.beta)
                sec_out["beta_g2"].slice_of(output, 0, 1)[:] = hb.serialize(
                    beta_el, compressed_output
                )

                for start, end in iter_chunk(parameters):
                    sc, ec = _chunk_rel(parameters, start, end)
                    apply_powers(
                        c1, sec_out["tau_g1"], sec_in["tau_g1"], sc, ec, None, (start, end), None
                    )
                    if start < parameters.powers_length:
                        if parameters.contribution_mode is ContributionMode.CHUNKED:
                            mx = min(
                                (parameters.chunk_index + 1) * parameters.chunk_size,
                                parameters.powers_length,
                            )
                        else:
                            mx = parameters.powers_length
                        end2 = mx if start + parameters.batch_size > mx else end
                        sc2, ec2 = _chunk_rel(parameters, start, end2)
                        apply_powers(
                            c2, sec_out["tau_g2"], sec_in["tau_g2"], sc2, ec2, None, (start, end2), None
                        )
                        apply_powers(
                            c1,
                            sec_out["alpha_g1"],
                            sec_in["alpha_g1"],
                            sc2,
                            ec2,
                            None,
                            (start, end2),
                            key.alpha,
                        )
                        apply_powers(
                            c1,
                            sec_out["beta_g1"],
                            sec_in["beta_g1"],
                            sc2,
                            ec2,
                            None,
                            (start, end2),
                            key.beta,
                        )
            else:  # Marlin
                n = parameters.total_size_in_log2
                if parameters.chunk_index == 0:
                    r = spec.r
                    degree_bound_powers = [
                        pow(key.tau, parameters.powers_length - 1 - (1 << i) + 2, r)
                        for i in range(n)
                    ]
                    g2_inverse_powers = [pow(p, -1, r) for p in degree_bound_powers]
                    apply_powers(
                        c2, sec_out["tau_g2"], sec_in["tau_g2"], 2, n + 2, g2_inverse_powers, None, None
                    )
                    g1_degree_powers = []
                    for f in degree_bound_powers:
                        g1_degree_powers += [f, f * key.tau % r, f * pow(key.tau, 2, r) % r]
                    apply_powers(
                        c1,
                        sec_out["alpha_g1"],
                        sec_in["alpha_g1"],
                        3,
                        3 + 3 * n,
                        g1_degree_powers,
                        None,
                        key.alpha,
                    )
                    alpha_powers = [pow(key.tau, i, r) for i in range(3)]
                    apply_powers(
                        c1, sec_out["alpha_g1"], sec_in["alpha_g1"], 0, 3, alpha_powers, None, key.alpha
                    )
                    tau01 = [1, key.tau % r]
                    apply_powers(
                        c2, sec_out["tau_g2"], sec_in["tau_g2"], 0, 2, tau01, None, None
                    )
                for start, end in iter_chunk(parameters):
                    sc, ec = _chunk_rel(parameters, start, end)
                    apply_powers(
                        c1, sec_out["tau_g1"], sec_in["tau_g1"], sc, ec, None, (start, end), None
                    )
            flush()

    # ------------------------------------------------------------------
    # Verification (phase1/src/verification.rs:26-500)
    # ------------------------------------------------------------------
    @staticmethod
    def verification(
        input_buf,
        output_buf,
        new_challenge: bytearray,
        key: PublicKey,
        digest: bytes,
        compressed_input: UseCompression,
        compressed_output: UseCompression,
        compressed_new_challenge: UseCompression,
        check_input_for_correctness: CheckForCorrectness,
        check_output_for_correctness: CheckForCorrectness,
        subgroup_check_mode: SubgroupCheckMode,
        ratio_check: bool,
        parameters: Phase1Parameters,
        rlc_rng=None,
    ) -> None:
        with info_span("phase1-verification", logger):
            spec = parameters.spec
            eng = pairing_engine(spec.name)
            sec_out = split(parameters, compressed_output)
            sec_new = split(parameters, compressed_new_challenge)
            hc1, hc2 = g1_codec(spec), g2_codec(spec)
            g1c, g2c = g1_curve(spec), g2_curve(spec)

            def read_initial(section: Section, buf, compressed, check, codec, amount=2):
                return [
                    codec.deserialize(
                        bytes(section.slice_of(buf, i, i + 1)), compressed, check
                    )
                    for i in range(amount)
                ]

            # g1/g2 check pairs from the OUTPUT's first two tau elements
            try:
                after_g1 = read_initial(
                    sec_out["tau_g1"], output_buf, compressed_output, check_output_for_correctness, hc1
                )
                after_g2 = read_initial(
                    sec_out["tau_g2"], output_buf, compressed_output, check_output_for_correctness, hc2
                )
                g1_check = (after_g1[0], after_g1[1])
                g2_check = (after_g2[0], after_g2[1])
            except Error:
                from ..curves.host import INFINITY

                g1_check = (INFINITY, INFINITY)
                g2_check = (INFINITY, INFINITY)
                ratio_check = False

            if (
                parameters.contribution_mode is ContributionMode.FULL
                or parameters.chunk_index == 0
            ):
                sec_in = split(parameters, compressed_input)
                tau_g2_s = compute_g2_s(spec, digest, key.tau_g1[0], key.tau_g1[1], 0)
                alpha_g2_s = compute_g2_s(spec, digest, key.alpha_g1[0], key.alpha_g1[1], 1)
                beta_g2_s = compute_g2_s(spec, digest, key.beta_g1[0], key.beta_g1[1], 2)

                tau_single_g2 = (tau_g2_s, key.tau_g2)
                alpha_single_g2 = (alpha_g2_s, key.alpha_g2)
                beta_single_g1 = (key.beta_g1[0], key.beta_g1[1])
                beta_single_g2 = (beta_g2_s, key.beta_g2)

                # proof-of-knowledge ratio checks
                eng.check_same_ratio((key.tau_g1[0], key.tau_g1[1]), tau_single_g2, "Tau G1<>G2")
                eng.check_same_ratio(
                    (key.alpha_g1[0], key.alpha_g1[1]), alpha_single_g2, "Alpha G1<>G2"
                )
                eng.check_same_ratio(beta_single_g1, beta_single_g2, "Beta G1<>G2")
                logger.debug("key ratios were correctly produced")

                # initial-element spot checks
                before_g1 = read_initial(
                    sec_in["tau_g1"], input_buf, compressed_input, check_input_for_correctness, hc1
                )
                after_g1 = read_initial(
                    sec_out["tau_g1"], output_buf, compressed_output, check_output_for_correctness, hc1
                )
                if after_g1[0] != g1c.generator:
                    raise InvalidGeneratorError(ElementType.TAU_G1)
                eng.check_same_ratio(
                    (before_g1[1], after_g1[1]), tau_single_g2, "Before-After: tau_g1"
                )
                before_g2 = read_initial(
                    sec_in["tau_g2"], input_buf, compressed_input, check_input_for_correctness, hc2
                )
                after_g2 = read_initial(
                    sec_out["tau_g2"], output_buf, compressed_output, check_output_for_correctness, hc2
                )
                if after_g2[0] != g2c.generator:
                    raise InvalidGeneratorError(ElementType.TAU_G2)
                eng.check_same_ratio(
                    (key.tau_g1[0], key.tau_g1[1]),
                    (before_g2[1], after_g2[1]),
                    "Before-After: tau_g2",
                )
                checks = [("alpha_g1", alpha_single_g2)]
                if parameters.proving_system is ProvingSystem.GROTH16:
                    checks.append(("beta_g1", beta_single_g2))
                for sec_name, check in checks:
                    b = read_initial(
                        sec_in[sec_name], input_buf, compressed_input, check_input_for_correctness, hc1
                    )
                    a = read_initial(
                        sec_out[sec_name], output_buf, compressed_output, check_output_for_correctness, hc1
                    )
                    eng.check_same_ratio(
                        (b[0], a[0]), check, "Before-After: alpha_g1[0] / beta_g1[0]"
                    )
                if parameters.proving_system is ProvingSystem.GROTH16:
                    before_beta_g2 = hc2.deserialize(
                        bytes(sec_in["beta_g2"].slice_of(input_buf, 0, 1)),
                        compressed_input,
                        check_input_for_correctness,
                    )
                    after_beta_g2 = hc2.deserialize(
                        bytes(sec_out["beta_g2"].slice_of(output_buf, 0, 1)),
                        compressed_output,
                        check_output_for_correctness,
                    )
                    sec_new["beta_g2"].slice_of(new_challenge, 0, 1)[:] = hc2.serialize(
                        after_beta_g2, compressed_new_challenge
                    )
                    eng.check_same_ratio(
                        beta_single_g1,
                        (before_beta_g2, after_beta_g2),
                        "Before-After: beta_g2[0]",
                    )

            logger.debug("initial elements were computed correctly")

            dc1 = batch_codec(spec.name, "g1")
            dc2 = batch_codec(spec.name, "g2")

            # Bounded dispatch/finish pipeline (VERDICT r4 #6, mirroring the
            # contribution write-back pipeline): for each batch the device
            # work — subgroup masks, the two RLC MSMs, and the new-challenge
            # write conversion with async device->host copies — is ENQUEUED
            # without any host sync; the blocking half (ok-flag readback,
            # MSM point sync + host pairing checks, byte packing) runs while
            # the NEXT batches' device work is already in flight. On the
            # tunneled backend this overlaps the per-batch round-trip tax
            # with compute; errors for batch i surface after batch i+1..
            # has been dispatched (any failure is fatal either way,
            # verification.rs:258).
            VERIFY_PIPELINE_DEPTH = 3
            pending: list = []

            def vflush(limit: int = 0) -> None:
                while len(pending) > limit:
                    pending.pop(0)()

            def process_section(
                codec: BatchPointCodec,
                sec_name: str,
                sc: int,
                ec: int,
                do_ratio: bool,
                check_pair_g2=None,
                check_pair_g1=None,
            ):
                """Nonzero+subgroup check, optional RLC power-pair ratio
                check, and write-through into the new challenge."""
                from ..shard import runtime as _shard_rt

                n = ec - sc
                pad = _shard_pad(parameters.batch_size + 1)
                pts = codec.read_batch(
                    bytes(sec_out[sec_name].slice_of(output_buf, sc, ec)),
                    compressed_output,
                    CheckForCorrectness.ONLY_NON_ZERO,
                    pad_to=pad,
                )
                # distribute the batch over an active mesh: the subgroup
                # subset sums and the RLC MSMs below then compile sharded
                # (per-shard partials + all-gathered single-point reduce)
                pts = _shard_rt.put_points(codec.ops, pts)
                sg = _subgroup_start(codec, pts, subgroup_check_mode, n)
                pp = None
                if do_ratio:
                    scalars = _rng_scalars_padded(n - 1, pad - 1, rng=rlc_rng)
                    pp = _power_pairs_start(codec.ops, pts, scalars)
                parts = codec.write_batch_start(pts, normalized=True)

                def finish():
                    _subgroup_finish(sg)
                    if pp is not None:
                        s_pt, sx_pt = _power_pairs_finish(codec.ops, pp)
                        if check_pair_g2 is not None:
                            eng.check_same_ratio(
                                (s_pt, sx_pt), check_pair_g2, f"Power pairs {sec_name}"
                            )
                        else:
                            eng.check_same_ratio(
                                check_pair_g1, (s_pt, sx_pt), f"Power pairs {sec_name}"
                            )
                    out_bytes = codec.write_batch_finish(
                        parts, compressed_new_challenge, n_valid=n
                    )
                    sec_new[sec_name].slice_of(new_challenge, sc, ec)[:] = out_bytes

                pending.append(finish)
                vflush(limit=VERIFY_PIPELINE_DEPTH - 1)

            for start, end in iter_chunk(parameters):
                sc, ec = _chunk_rel(parameters, start, end)
                if ratio_check and end <= start + 1:
                    raise BatchTooSmallError()
                if parameters.proving_system is ProvingSystem.GROTH16:
                    process_section(dc1, "tau_g1", sc, ec, ratio_check, check_pair_g2=g2_check)
                    if start < parameters.powers_length:
                        if parameters.contribution_mode is ContributionMode.CHUNKED:
                            mx = min(
                                (parameters.chunk_index + 1) * parameters.chunk_size,
                                parameters.powers_length,
                            )
                        else:
                            mx = parameters.powers_length
                        end2 = mx if start + parameters.batch_size > mx else end
                        sc2, ec2 = _chunk_rel(parameters, start, end2)
                        if end2 > start + 1:
                            process_section(
                                dc2, "tau_g2", sc2, ec2, ratio_check, check_pair_g1=g1_check
                            )
                            process_section(
                                dc1, "alpha_g1", sc2, ec2, ratio_check, check_pair_g2=g2_check
                            )
                            process_section(
                                dc1, "beta_g1", sc2, ec2, ratio_check, check_pair_g2=g2_check
                            )
                else:  # Marlin
                    process_section(dc1, "tau_g1", sc, ec, False)
                    if start == 0:
                        n = parameters.total_size_in_log2
                        process_section(dc1, "alpha_g1", 0, 3 + 3 * n, False)
                        process_section(dc2, "tau_g2", 0, n + 2, False)
            vflush()

    # ------------------------------------------------------------------
    # Aggregate verification (verification.rs:505-769)
    # ------------------------------------------------------------------
    @staticmethod
    def aggregate_verification(
        output_buf,
        compressed_output: UseCompression,
        check_output_for_correctness: CheckForCorrectness,
        parameters: Phase1Parameters,
        rlc_rng=None,
    ) -> None:
        with info_span("phase1-aggregate-verification", logger):
            spec = parameters.spec
            eng = pairing_engine(spec.name)
            sec = split(parameters, compressed_output)
            hc1, hc2 = g1_codec(spec), g2_codec(spec)
            dc1 = batch_codec(spec.name, "g1")
            dc2 = batch_codec(spec.name, "g2")

            def read_el(codec, section, i, check=check_output_for_correctness):
                return codec.deserialize(
                    bytes(section.slice_of(output_buf, i, i + 1)), compressed_output, check
                )

            g1_check = (read_el(hc1, sec["tau_g1"], 0), read_el(hc1, sec["tau_g1"], 1))
            g2_check = (read_el(hc2, sec["tau_g2"], 0), read_el(hc2, sec["tau_g2"], 1))
            alpha_check = (
                read_el(hc1, sec["alpha_g1"], 0),
                read_el(hc1, sec["alpha_g1"], 1),
            )

            # same bounded dispatch/finish pipeline as verification: MSMs
            # for the next batches are enqueued while this batch's pairing
            # checks run on host
            pending: list = []

            def vflush(limit: int = 0) -> None:
                while len(pending) > limit:
                    pending.pop(0)()

            def ratio_section(codec, sec_name, s, e, check_pair_g2=None, check_pair_g1=None):
                from ..shard import runtime as _shard_rt

                n = e - s
                pad = _shard_pad(parameters.batch_size + 1)
                pts = codec.read_batch(
                    bytes(sec[sec_name].slice_of(output_buf, s, e)),
                    compressed_output,
                    check_output_for_correctness,
                    subgroup_mode=SubgroupCheckMode.NO,
                    pad_to=pad,
                )
                pts = _shard_rt.put_points(codec.ops, pts)
                scalars = _rng_scalars_padded(n - 1, pad - 1, rng=rlc_rng)
                pp = _power_pairs_start(codec.ops, pts, scalars)

                def finish():
                    s_pt, sx_pt = _power_pairs_finish(codec.ops, pp)
                    if check_pair_g2 is not None:
                        eng.check_same_ratio((s_pt, sx_pt), check_pair_g2, f"Power pairs {sec_name}")
                    else:
                        eng.check_same_ratio(check_pair_g1, (s_pt, sx_pt), f"Power pairs {sec_name}")

                pending.append(finish)
                vflush(limit=2)

            if parameters.proving_system is ProvingSystem.GROTH16:
                for start, end in iter_chunk(parameters):
                    ratio_section(dc1, "tau_g1", start, end, check_pair_g2=g2_check)
                    if start < parameters.powers_length:
                        end2 = (
                            parameters.powers_length
                            if start + parameters.batch_size > parameters.powers_length
                            else end
                        )
                        if end2 > start + 1:
                            ratio_section(dc2, "tau_g2", start, end2, check_pair_g1=g1_check)
                            ratio_section(dc1, "alpha_g1", start, end2, check_pair_g2=g2_check)
                            ratio_section(dc1, "beta_g1", start, end2, check_pair_g2=g2_check)
            else:  # Marlin
                n = parameters.total_size_in_log2
                for start, end in iter_chunk(parameters):
                    ratio_section(dc1, "tau_g1", start, end, check_pair_g2=g2_check)
                    powers_in_range = [
                        (i, parameters.powers_length - 1 - (1 << i) + 2)
                        for i in range(n)
                    ]
                    for i, p in [(i, p) for i, p in powers_in_range if start <= p < end]:
                        g1_el = read_el(hc1, sec["tau_g1"], p)
                        g2_el = read_el(hc2, sec["tau_g2"], 2 + i)
                        eng.check_same_ratio(
                            (g1_el, g1_curve(spec).generator),
                            (g2_curve(spec).generator, g2_el),
                            "G1<>G2",
                        )
                        a0 = read_el(hc1, sec["alpha_g1"], 3 + 3 * i)
                        a1 = read_el(hc1, sec["alpha_g1"], 3 + 3 * i + 1)
                        a2 = read_el(hc1, sec["alpha_g1"], 3 + 3 * i + 2)
                        eng.check_same_ratio((a0, a1), g2_check, "alpha_g1 ratio 1")
                        eng.check_same_ratio((a1, a2), g2_check, "alpha_g1 ratio 2")
                        eng.check_same_ratio(
                            (a0, alpha_check[0]),
                            (g2_curve(spec).generator, g2_el),
                            "alpha consistent",
                        )
                    if start == 0:
                        ratio_section(dc1, "alpha_g1", 0, 3, check_pair_g2=g2_check)
                        ratio_section(dc2, "tau_g2", 0, 2, check_pair_g1=g1_check)
            vflush()

    # ------------------------------------------------------------------
    # Aggregation / combine (aggregation.rs:11-180)
    # ------------------------------------------------------------------
    @staticmethod
    def aggregation(
        inputs: list[tuple[bytes, UseCompression]],
        output: bytearray,
        compressed_output: UseCompression,
        parameters: Phase1Parameters,
    ) -> None:
        with info_span("phase1-aggregation", logger):
            for chunk_index, (input_buf, compressed_input) in enumerate(inputs):
                chunk_params = parameters.into_chunk_parameters(
                    parameters.contribution_mode, chunk_index, parameters.chunk_size
                )
                sec_in = split(chunk_params, compressed_input)
                sec_out = split_at_chunk(chunk_params, compressed_output)
                start = chunk_index * chunk_params.chunk_size
                n = chunk_params.total_size_in_log2

                if parameters.proving_system is ProvingSystem.GROTH16:
                    names = ["tau_g1"]
                    if start < chunk_params.powers_length:
                        names += ["tau_g2", "alpha_g1", "beta_g1"]
                    if chunk_index == 0:
                        names.append("beta_g2")
                else:
                    names = ["tau_g1"]
                    if start < 2 + n:
                        names.append("tau_g2")
                    if start < 3 + 3 * n:
                        names.append("alpha_g1")

                for name in names:
                    _recode_section(
                        chunk_params,
                        name,
                        input_buf,
                        sec_in[name],
                        compressed_input,
                        output,
                        sec_out[name],
                        compressed_output,
                    )

    # ------------------------------------------------------------------
    # Split (aggregation.rs:183-352)
    # ------------------------------------------------------------------
    @staticmethod
    def split(
        input_buf,
        compressed_input: UseCompression,
        outputs: list[tuple[bytearray, UseCompression]],
        parameters: Phase1Parameters,
    ) -> None:
        with info_span("phase1-split", logger):
            for chunk_index, (output, compressed_output) in enumerate(outputs):
                chunk_params = parameters.into_chunk_parameters(
                    parameters.contribution_mode, chunk_index, parameters.chunk_size
                )
                sec_in = split_at_chunk(chunk_params, compressed_input)
                sec_out = split(chunk_params, compressed_output)
                start = chunk_index * chunk_params.chunk_size
                n = chunk_params.total_size_in_log2
                if parameters.proving_system is ProvingSystem.GROTH16:
                    names = ["tau_g1"]
                    if start < chunk_params.powers_length:
                        names += ["tau_g2", "alpha_g1", "beta_g1"]
                    names.append("beta_g2")
                else:
                    names = ["tau_g1"]
                    if start < 2 + n:
                        names.append("tau_g2")
                    if start < 3 + 3 * n:
                        names.append("alpha_g1")
                for name in names:
                    _recode_section(
                        chunk_params,
                        name,
                        input_buf,
                        sec_in[name],
                        compressed_input,
                        output,
                        sec_out[name],
                        compressed_output,
                    )

    # ------------------------------------------------------------------
    # Decompress (accumulator.rs:200-301)
    # ------------------------------------------------------------------
    @staticmethod
    def decompress(
        input_buf,
        output: bytearray,
        check_input_for_correctness: CheckForCorrectness,
        parameters: Phase1Parameters,
    ) -> None:
        sec_in = split(parameters, UseCompression.YES)
        sec_out = split(parameters, UseCompression.NO)
        for name in ("tau_g1", "tau_g2", "alpha_g1", "beta_g1", "beta_g2"):
            if sec_in[name].num_elements == 0:
                continue
            _recode_section(
                parameters,
                name,
                input_buf,
                sec_in[name],
                UseCompression.YES,
                output,
                sec_out[name],
                UseCompression.NO,
                check=check_input_for_correctness,
            )

    # ------------------------------------------------------------------
    # Host (de)serialization for tests (serialization.rs)
    # ------------------------------------------------------------------
    @staticmethod
    def deserialize(
        input_buf,
        compression: UseCompression,
        check_input_for_correctness: CheckForCorrectness,
        parameters: Phase1Parameters,
    ) -> "Phase1":
        spec = parameters.spec
        sec = split(parameters, compression)
        dc1 = batch_codec(spec.name, "g1")
        dc2 = batch_codec(spec.name, "g2")

        # caller-controlled batch sizes (reference scripts use 2^17/2^21)
        # must not become single device graphs wider than the measured-safe
        # bound — see BatchPointCodec.MAX_DEVICE_BATCH
        B = min(parameters.batch_size, dc1.MAX_DEVICE_BATCH)

        def read_vec(codec, s: Section):
            if s.num_elements == 0:
                return []
            out = []
            for off in range(0, s.num_elements, B):
                hi = min(off + B, s.num_elements)
                pts = codec.read_batch(
                    bytes(s.slice_of(input_buf, off, hi)),
                    compression,
                    check_input_for_correctness,
                    subgroup_mode=SubgroupCheckMode.AUTO,
                    pad_to=B + 1,
                )
                out.extend(codec.ops.to_affine_host(pts)[: hi - off])
            return out

        tau_g1 = read_vec(dc1, sec["tau_g1"])
        tau_g2 = read_vec(dc2, sec["tau_g2"])
        alpha_g1 = read_vec(dc1, sec["alpha_g1"])
        beta_g1 = read_vec(dc1, sec["beta_g1"])
        beta_g2_l = read_vec(dc2, sec["beta_g2"])
        return Phase1(
            tau_g1,
            tau_g2,
            alpha_g1,
            beta_g1,
            beta_g2_l[0] if beta_g2_l else None,
            blank_hash(),
            parameters,
        )

    @staticmethod
    def serialize_accumulator(
        acc: "Phase1", output: bytearray, compression: UseCompression, parameters: Phase1Parameters
    ) -> None:
        spec = parameters.spec
        sec = split(parameters, compression)
        dc1 = batch_codec(spec.name, "g1")
        dc2 = batch_codec(spec.name, "g2")

        B = min(parameters.batch_size, dc1.MAX_DEVICE_BATCH)

        def write_vec(codec, s: Section, pts):
            if not pts:
                return
            for off in range(0, len(pts), B):
                chunk = pts[off : off + B]
                n = len(chunk)
                if n < B:
                    from ..curves.host import INFINITY

                    chunk = chunk + [INFINITY] * (B - n)
                dev = codec.ops.from_affine_host(chunk)
                s.slice_of(output, off, off + n)[:] = codec.write_batch(
                    dev, compression, normalized=True, n_valid=n
                )

        write_vec(dc1, sec["tau_g1"], acc.tau_powers_g1)
        write_vec(dc2, sec["tau_g2"], acc.tau_powers_g2)
        write_vec(dc1, sec["alpha_g1"], acc.alpha_tau_powers_g1)
        write_vec(dc1, sec["beta_g1"], acc.beta_tau_powers_g1)
        if acc.beta_g2 is not None:
            write_vec(dc2, sec["beta_g2"], [acc.beta_g2])


# ----------------------------------------------------------------------
# device helpers
# ----------------------------------------------------------------------


def _tau_powers_raw(
    fr, tau: int, start: int, end: int, coeff: int | None, as_numpy: bool = True
):
    """Raw (standard-form) limb scalars tau^i (optionally * coeff) for
    i in [start, end), generated on device via 32-bit vectorized pow —
    one jitted call (pow + coeff mul + Montgomery->standard conversion).
    `as_numpy=False` keeps the result on device (no synchronizing readback —
    important inside the computation dispatch pipeline).

    Replaces generate_powers_of_tau (helpers.rs:32-37)."""
    tau_mont = fr.from_int(tau)[:, None]
    exps = np.arange(start, end, dtype=np.uint32)
    cm = fr.from_int(coeff)[:, None] if coeff is not None else np.asarray(fr.one_mont_np)
    out = _pow_u32(fr, tau_mont, exps, cm)
    return np.asarray(out) if as_numpy else out


_pow_u32_cache = {}


def _pow_u32(fr, base_mont, exps_u32, coeff_mont):
    """(base^e * coeff) in standard form for a batch of uint32 exponents
    (scan over 32 bits)."""
    import jax
    import jax.numpy as jnp

    key = id(fr)
    if key not in _pow_u32_cache:

        def f(base, exps, cm):
            # (32, n) bit planes, MSB first
            bits = jnp.flip(
                (exps[None, :] >> np.arange(32, dtype=np.uint32)[:, None]) & 1, 0
            ).astype(bool)
            acc = jnp.broadcast_to(fr.one_mont_np, (fr.L, exps.shape[0]))

            def step(acc, bit):
                acc = fr.mont_sqr(acc)
                return fr.select(bit, fr.mont_mul(acc, base), acc), None

            acc, _ = jax.lax.scan(step, acc, bits)
            acc = fr.mont_mul(acc, cm)
            return fr.from_mont(acc)

        _pow_u32_cache[key] = jax.jit(f)
    return _pow_u32_cache[key](base_mont, exps_u32, coeff_mont)


_pp_slice_cache = {}


def _power_pairs_start(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray):
    """Dispatch merge_pairs(v[:-1], v[1:]) with shared random scalars: two
    device MSMs through the public-scalar MSM path (Pippenger buckets above
    PIPPENGER_MIN). Returns device single-point handles — NO host sync, so
    a verification pipeline can enqueue the next batch's work while these
    MSMs run (helpers.rs:371-390)."""
    import jax

    key = id(ops)
    if key not in _pp_slice_cache:

        def sl(p):
            import jax.tree_util as jtu

            head = jtu.tree_map(lambda a: a[..., :-1], dict(p))
            tail = jtu.tree_map(lambda a: a[..., 1:], dict(p))
            return head, tail

        _pp_slice_cache[key] = jax.jit(sl)
    head, tail = _pp_slice_cache[key](pts)
    s = _msm_device(ops, PointVec(head), scalars_raw, RLC_BITS)
    sx = _msm_device(ops, PointVec(tail), scalars_raw, RLC_BITS)
    return s, sx


def _power_pairs_finish(ops: CurveOps, handle):
    """Host half of _power_pairs_start: sync the two MSM points."""
    s, sx = handle
    return ops.to_affine_host(s)[0], ops.to_affine_host(sx)[0]


def _power_pairs_device(ops: CurveOps, pts: PointVec, scalars_raw: np.ndarray):
    """Synchronous merge-pairs MSM (dispatch + finish in one call)."""
    return _power_pairs_finish(ops, _power_pairs_start(ops, pts, scalars_raw))


SUBGROUP_BATCH_ROUNDS = 64
"""Soundness parameter of the batched subgroup check: number of independent
random-subset rounds. Escape probability <= 2^-SUBGROUP_BATCH_ROUNDS."""

_batched_sg_cache: dict = {}


def _batched_subgroup_sums(ops, pts: PointVec, bits_host) -> PointVec:
    """ROUNDS random-subset sums of the point batch: sums[j] = sum over
    {i : bits[j,i]} of P_i. One jitted lax.scan over rounds (masked select
    to infinity + tree reduction per round)."""
    import jax
    import jax.numpy as jnp

    key = (id(ops), pts["x"].shape, bits_host.shape)
    if key not in _batched_sg_cache:

        def f(p, bits):
            inf = ops.infinity((bits.shape[-1],))

            def rnd(_, b):
                masked = ops.select(b, p, inf)
                return None, dict(ops.sum_reduce(masked))

            _, sums = jax.lax.scan(rnd, None, bits)
            # scan stacks the per-round single points on a leading axis:
            # (rounds, L[, d], 1) -> (L[, d], rounds)
            return {k: jnp.moveaxis(v[..., 0], 0, -1) for k, v in sums.items()}

        _batched_sg_cache[key] = jax.jit(f)
    return PointVec(_batched_sg_cache[key](pts, bits_host))


def _check_subgroup_device(
    codec: BatchPointCodec, pts: PointVec, mode: SubgroupCheckMode, n: int
) -> None:
    """Nonzero assumed already checked. Direct: r*P == O per element.
    Auto: Direct below 2^12 elements, else Batched (accumulator.rs:109-119
    crossover; the reference stubs Batched, elements.rs:123-139 — here it is
    real AND sound).

    Batched soundness (why a single random linear combination is NOT used):
    writing P_i = S_i + T_i with S_i in the order-r subgroup and T_i in the
    cofactor group, a single RLC Q = sum t_i P_i escapes detection when
    sum t_i T_i = 0, which for a torsion component of small prime order l
    (l | cofactor; l=2 on BLS12-377 G1) happens with probability 1/l — NOT
    2^-128, however wide the t_i are (only t_i mod l matters). No one-MSM
    trick fixes this: one linear functional mod 2 yields one bit of
    soundness. So the check runs SUBGROUP_BATCH_ROUNDS independent
    random-subset rounds: Q_j = sum over a uniform subset of the batch, and
    each Q_j gets the full Direct check ([r]Q_j == O; r is coprime to the
    cofactor, so any surviving torsion component fails it). For any nonzero
    torsion vector, P[subset sum has zero torsion] <= 1/2 per round for
    EVERY cofactor prime, so the escape probability is <= 2^-ROUNDS
    independent of the cofactor factorization. Cost: ROUNDS complete adds
    per point (~768 Fq muls at ROUNDS=64) vs a full-order ladder per point
    for Direct (~2.9k muls) — still a ~4x win at production batch sizes.

    The per-round Direct check on the Q_j MUST NOT use the GLV path: GLV
    computes k1 P + k2 phi(P), which equals [k]P only inside the subgroup —
    the very property under test. codec.subgroup_mask_direct uses the raw
    windowed ladder (complete formulas, no endomorphism). Padding columns
    beyond n hold infinity points and contribute the identity to every
    subset sum."""
    _subgroup_finish(_subgroup_start(codec, pts, mode, n))


def _subgroup_start(
    codec: BatchPointCodec, pts: PointVec, mode: SubgroupCheckMode, n: int
):
    """Dispatch half of _check_subgroup_device: enqueues the device work
    and returns an (unsynced) all-ok scalar handle — letting a pipeline
    overlap the next batch's read/MSM with this check."""
    import jax.numpy as jnp

    if mode is SubgroupCheckMode.NO:
        return None
    batched = (mode is SubgroupCheckMode.BATCHED) or (
        mode is SubgroupCheckMode.AUTO and n > (1 << 12)
    )
    ops = codec.ops
    if not batched:
        ok = codec.subgroup_mask(pts)
        return ("direct", jnp.all(ok | ops.is_infinity(pts)))
    import secrets

    pad = int(pts["x"].shape[-1])
    rounds = SUBGROUP_BATCH_ROUNDS
    raw = np.frombuffer(secrets.token_bytes(rounds * pad), np.uint8)
    bits = (raw.reshape(rounds, pad) & 1).astype(bool)
    sums = _batched_subgroup_sums(ops, pts, bits)
    ok = codec.subgroup_mask(sums) | ops.is_infinity(sums)
    return ("batched", jnp.all(ok))


def _subgroup_finish(handle) -> None:
    """Sync half of _subgroup_start: blocks on the all-ok scalar."""
    if handle is None:
        return
    kind, ok = handle
    if not bool(ok):
        if kind == "direct":
            raise IncorrectSubgroupError("element not in prime-order subgroup")
        raise IncorrectSubgroupError("batched subgroup check failed")


def _recode_section(
    parameters: Phase1Parameters,
    name: str,
    input_buf,
    s_in: Section,
    comp_in: UseCompression,
    output,
    s_out: Section,
    comp_out: UseCompression,
    check: CheckForCorrectness = CheckForCorrectness.NO,
) -> None:
    """Copy a section between buffers, re-coding compression if needed.

    Streams in bounded batches (<= MAX_DEVICE_BATCH elements each) so
    combine/split/decompress never materialize a whole section as one
    device graph — at the reference's power-27 target a section is 2^28-1
    elements (benchmark.sh:4-8), far beyond both HBM and the measured
    wide-graph miscompile boundary. Memory envelope: one batch of limb
    planes (~13 MB for G1 at 2^13) regardless of section size."""
    if s_in.num_elements == 0:
        return
    if comp_in is comp_out and check is CheckForCorrectness.NO:
        s_out.slice_of(output)[:] = s_in.slice_of(input_buf)
        return
    spec = parameters.spec
    group = "g2" if name in ("tau_g2", "beta_g2") else "g1"
    codec = batch_codec(spec.name, group)
    n = s_in.num_elements
    B = min(n, codec.MAX_DEVICE_BATCH)
    for off in range(0, n, B):
        hi = min(off + B, n)
        pts = codec.read_batch(
            bytes(s_in.slice_of(input_buf, off, hi)), comp_in, check, pad_to=B
        )
        s_out.slice_of(output, off, hi)[:] = codec.write_batch(
            pts, comp_out, normalized=True, n_valid=hi - off
        )
