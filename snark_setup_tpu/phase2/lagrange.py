"""Groth16Params — phase-1 powers → Lagrange coefficient form (prepare_phase2).

Reference: setup-utils/src/groth16_utils.rs. The four IFFTs over group
elements and the h-query elementwise subtraction are the hot loops
(groth16_utils.rs:44-63); they run on TPU via ntt.group_fft. Wire format
(SURVEY §2.9.3): [alpha_g1 ‖ beta_g1 ‖ beta_g2 ‖ coeffs_g1 ‖ coeffs_g2 ‖
alpha_coeffs_g1 ‖ beta_coeffs_g1 ‖ h_g1], no length prefixes; vectors are
`size` long except h (`size`−1).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.constants import CurveSpec, get_curve
from ..curves.host import AffinePoint
from ..ntt.domain import Radix2Domain
from ..ntt.group_fft import group_fft, h_query_device
from ..ops.curve_jax import curve_ops
from ..utils.enums import CheckForCorrectness, UseCompression
from ..utils.tracing import get_logger, info_span
from .vecio import Cursor, deser_element, deser_vec, ser_element, ser_vec

logger = get_logger("snark_setup_tpu.phase2.lagrange")


@dataclass
class Groth16Params:
    spec: CurveSpec
    alpha_g1: AffinePoint
    beta_g1: AffinePoint
    beta_g2: AffinePoint
    coeffs_g1: list[AffinePoint]
    coeffs_g2: list[AffinePoint]
    alpha_coeffs_g1: list[AffinePoint]
    beta_coeffs_g1: list[AffinePoint]
    h_g1: list[AffinePoint]

    def __eq__(self, other):
        return (
            self.alpha_g1 == other.alpha_g1
            and self.beta_g1 == other.beta_g1
            and self.beta_g2 == other.beta_g2
            and self.coeffs_g1 == other.coeffs_g1
            and self.coeffs_g2 == other.coeffs_g2
            and self.alpha_coeffs_g1 == other.alpha_coeffs_g1
            and self.beta_coeffs_g1 == other.beta_coeffs_g1
            and self.h_g1 == other.h_g1
        )

    # ------------------------------------------------------------------
    @classmethod
    def new(
        cls,
        curve_name: str,
        phase2_size: int,
        tau_powers_g1: list[AffinePoint],
        tau_powers_g2: list[AffinePoint],
        alpha_tau_powers_g1: list[AffinePoint],
        beta_tau_powers_g1: list[AffinePoint],
        beta_g2: AffinePoint,
    ) -> "Groth16Params":
        """Four device IFFTs + the h-query kernel (groth16_utils.rs:81-131).

        Raises if the (rounded-up) domain exceeds any input vector, like the
        reference's slice-index panic."""
        with info_span("groth16-params-new", logger):
            spec = get_curve(curve_name)
            domain = Radix2Domain(curve_name, phase2_size)
            m = domain.size
            if (
                m > len(tau_powers_g2)
                or 2 * m - 1 > len(tau_powers_g1)
                or m > len(alpha_tau_powers_g1)
                or m > len(beta_tau_powers_g1)
            ):
                raise ValueError(
                    f"phase2 domain size {m} exceeds phase-1 vector lengths"
                )
            g1 = curve_ops(curve_name, "g1")
            g2 = curve_ops(curve_name, "g2")
            f1 = group_fft(curve_name, "g1", m)
            f2 = group_fft(curve_name, "g2", m)

            def ifft(ops, fft, pts):
                dev = ops.from_affine_host(pts[:m])
                return ops.to_affine_host(fft.ifft(dev))

            coeffs_g1 = ifft(g1, f1, tau_powers_g1)
            logger.debug("tau g1 coefficients calculated")
            coeffs_g2 = ifft(g2, f2, tau_powers_g2)
            logger.debug("tau g2 coefficients calculated")
            alpha_coeffs_g1 = ifft(g1, f1, alpha_tau_powers_g1)
            beta_coeffs_g1 = ifft(g1, f1, beta_tau_powers_g1)
            hq_in = g1.from_affine_host(tau_powers_g1[: 2 * m - 1])
            h_g1 = g1.to_affine_host(h_query_device(g1, hq_in, m))
            logger.debug("h query coefficients calculated")
            return cls(
                spec,
                alpha_tau_powers_g1[0],
                beta_tau_powers_g1[0],
                beta_g2,
                coeffs_g1,
                coeffs_g2,
                alpha_coeffs_g1,
                beta_coeffs_g1,
                h_g1,
            )

    # ------------------------------------------------------------------
    def write(self, compression: UseCompression) -> bytes:
        """groth16_utils.rs:134-169 layout (write_elements_exact: no
        prefixes)."""
        spec = self.spec
        parts = [
            ser_element(spec, "g1", self.alpha_g1, compression),
            ser_element(spec, "g1", self.beta_g1, compression),
            ser_element(spec, "g2", self.beta_g2, compression),
            ser_vec(spec, "g1", self.coeffs_g1, compression, prefix=False),
            ser_vec(spec, "g2", self.coeffs_g2, compression, prefix=False),
            ser_vec(spec, "g1", self.alpha_coeffs_g1, compression, prefix=False),
            ser_vec(spec, "g1", self.beta_coeffs_g1, compression, prefix=False),
            ser_vec(spec, "g1", self.h_g1, compression, prefix=False),
        ]
        return b"".join(parts)

    @classmethod
    def read(
        cls,
        curve_name: str,
        data,
        compression: UseCompression,
        check: CheckForCorrectness,
        domain_size: int,
        phase1_size: int | None = None,
    ) -> "Groth16Params":
        """groth16_utils.rs:173-233: reads the first `domain_size`
        coefficients of a transcript holding `phase1_size` per section
        (equal when reading a transcript prepared at the same size)."""
        with info_span("groth16-params-read", logger):
            spec = get_curve(curve_name)
            if phase1_size is None:
                phase1_size = domain_size
            cur = Cursor(data)
            alpha_g1 = deser_element(spec, "g1", cur, compression, check)
            beta_g1 = deser_element(spec, "g1", cur, compression, check)
            beta_g2 = deser_element(spec, "g2", cur, compression, check)
            from ..serialize.arkworks import g1_codec, g2_codec

            g1_size = g1_codec(spec).size(compression)
            g2_size = g2_codec(spec).size(compression)
            skip1 = (phase1_size - domain_size) * g1_size
            skip2 = (phase1_size - domain_size) * g2_size

            coeffs_g1 = deser_vec(spec, "g1", cur, compression, check, count=domain_size)
            cur.skip(skip1)
            coeffs_g2 = deser_vec(spec, "g2", cur, compression, check, count=domain_size)
            cur.skip(skip2)
            alpha_coeffs_g1 = deser_vec(spec, "g1", cur, compression, check, count=domain_size)
            cur.skip(skip1)
            beta_coeffs_g1 = deser_vec(spec, "g1", cur, compression, check, count=domain_size)
            cur.skip(skip1)
            h_g1 = deser_vec(spec, "g1", cur, compression, check, count=domain_size - 1)
            return cls(
                spec,
                alpha_g1,
                beta_g1,
                beta_g2,
                coeffs_g1,
                coeffs_g2,
                alpha_coeffs_g1,
                beta_coeffs_g1,
                h_g1,
            )


def prepare_transcript_device(
    curve_name: str,
    phase2_size: int,
    response,
    parameters,
    compression_in: UseCompression = UseCompression.NO,
    check: CheckForCorrectness = CheckForCorrectness.NO,
    compression_out: UseCompression = UseCompression.NO,
) -> bytes:
    """Device-resident prepare_phase2 (VERDICT r4 #4): bytes -> bounded
    device reads -> on-device IFFTs + h-query -> bounded device writes,
    WITHOUT ever materializing a vector as Python AffinePoint objects
    (Groth16Params.new holds ~domain_size host points per section — at the
    reference's 2^27 target that is ~10^8 Python objects; this path's host
    footprint is one bounded batch of limb planes).

    Byte-identical to Groth16Params.new(...).write(compression_out)
    (tests/test_phase2.py::test_prepare_device_matches_host). Reference:
    phase2-cli/src/prepare_phase2.rs:16-69, groth16_utils.rs:44-131."""
    import jax.numpy as jnp

    from ..ops.codec_jax import batch_codec
    from ..ops.curve_jax import PointVec
    from ..phase1.buffers import split as p1_split
    from ..serialize.arkworks import g1_codec, g2_codec

    with info_span("prepare-phase2-device", logger):
        spec = get_curve(curve_name)
        domain = Radix2Domain(curve_name, phase2_size)
        m = domain.size
        sec = p1_split(parameters, compression_in)
        if (
            m > sec["tau_g2"].num_elements
            or 2 * m - 1 > sec["tau_g1"].num_elements
            or m > sec["alpha_g1"].num_elements
            or m > sec["beta_g1"].num_elements
        ):
            raise ValueError(
                f"phase2 domain size {m} exceeds phase-1 vector lengths"
            )
        c1 = batch_codec(curve_name, "g1")
        c2 = batch_codec(curve_name, "g2")

        def read_dev(codec, s, count) -> PointVec:
            M = codec.MAX_DEVICE_BATCH
            parts = []
            for lo in range(0, count, M):
                hi = min(lo + M, count)
                parts.append(
                    dict(
                        codec.read_batch(
                            bytes(s.slice_of(response, lo, hi)),
                            compression_in,
                            check,
                        )
                    )
                )
            if len(parts) == 1:
                return PointVec(parts[0])
            return PointVec(
                {
                    k: jnp.concatenate([p[k] for p in parts], axis=-1)
                    for k in ("x", "y", "z")
                }
            )

        def write_dev(codec, pts, count) -> bytes:
            return codec.write_batch(pts, compression_out, n_valid=count)

        f1 = group_fft(curve_name, "g1", m)
        f2 = group_fft(curve_name, "g2", m)

        hc1, hc2 = g1_codec(spec), g2_codec(spec)

        def read_one(codec, s):
            return codec.deserialize(
                bytes(s.slice_of(response, 0, 1)), compression_in, check
            )

        alpha_g1 = read_one(hc1, sec["alpha_g1"])
        beta_g1 = read_one(hc1, sec["beta_g1"])
        beta_g2 = read_one(hc2, sec["beta_g2"])

        tau1_full = read_dev(c1, sec["tau_g1"], 2 * m - 1)
        h_bytes = write_dev(
            c1, h_query_device(f1.ops, tau1_full, m), m - 1
        )
        logger.debug("h query coefficients calculated")
        tau1_m = PointVec({k: v[..., :m] for k, v in tau1_full.items()})
        del tau1_full
        coeffs_g1 = write_dev(c1, f1.ifft(tau1_m), m)
        del tau1_m
        logger.debug("tau g1 coefficients calculated")
        coeffs_g2 = write_dev(c2, f2.ifft(read_dev(c2, sec["tau_g2"], m)), m)
        logger.debug("tau g2 coefficients calculated")
        alpha_coeffs = write_dev(
            c1, f1.ifft(read_dev(c1, sec["alpha_g1"], m)), m
        )
        beta_coeffs = write_dev(
            c1, f1.ifft(read_dev(c1, sec["beta_g1"], m)), m
        )
        return b"".join(
            [
                hc1.serialize(alpha_g1, compression_out),
                hc1.serialize(beta_g1, compression_out),
                hc2.serialize(beta_g2, compression_out),
                coeffs_g1,
                coeffs_g2,
                alpha_coeffs,
                beta_coeffs,
                h_bytes,
            ]
        )
