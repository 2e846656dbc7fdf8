#!/usr/bin/env python
"""prepare_phase2 at reference production scale on the TPU (VERDICT r4 #4).

Builds a synthetic full accumulator with KNOWN tau (so inputs need no real
ceremony), runs the device-resident prepare path
(phase2.lagrange.prepare_transcript_device) at phase2_size 2^POWER, and
verifies with a forward-FFT inverse check: the produced coefficient
vectors must FFT back to the original evaluation points (sampled lanes,
byte-level compare vs the input section) — a full-strength device-side
oracle that would catch corruption anywhere in read/IFFT/write. The
h-query gets a direct host-math spot-check at sampled indices.

Reference scale match: phase1_chunked_prepare_phase2.sh:7-10 runs POWER=18.
Usage: python benches/prepare2_tpu.py [power=18]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    m = 1 << power
    curve = "bls12_377"

    import jax.numpy as jnp

    from snark_setup_tpu.ops.codec_jax import batch_codec
    from snark_setup_tpu.ops.curve_jax import PointVec, curve_ops
    from snark_setup_tpu.phase1.buffers import split as p1_split
    from snark_setup_tpu.phase1.parameters import Phase1Parameters
    from snark_setup_tpu.phase1.protocol import _tau_powers_raw
    from snark_setup_tpu.phase2.lagrange import prepare_transcript_device
    from snark_setup_tpu.utils.enums import (
        CheckForCorrectness,
        ProvingSystem,
        UseCompression,
    )

    params = Phase1Parameters.new_full(curve, ProvingSystem.GROTH16, power, 1 << 13)
    spec = params.spec
    g1 = curve_ops(curve, "g1")
    g2 = curve_ops(curve, "g2")
    c1 = batch_codec(curve, "g1")
    c2 = batch_codec(curve, "g2")
    tau = 0x1234_5678_9ABC_DEF0_1357_9BDF % spec.r

    # synthesize the accumulator: tau^i G in bounded device batches
    print(f"building synthetic accumulator (power {power})...", flush=True)
    t0 = time.time()
    buf = bytearray(params.get_length(UseCompression.NO))
    sec = p1_split(params, UseCompression.NO)
    M = c1.MAX_DEVICE_BATCH

    def fill(codec, ops, s, count, coeff=None):
        gen = ops.from_affine_host([ops.host_curve.generator] * M)
        for lo in range(0, count, M):
            hi = min(lo + M, count)
            raw = _tau_powers_raw(ops.fr, tau, lo, lo + M, coeff, as_numpy=False)
            prod = ops.scalar_mul(PointVec(gen), raw)
            s.slice_of(buf, lo, hi)[:] = codec.write_batch(
                prod, UseCompression.NO, n_valid=hi - lo
            )

    fill(c1, g1, sec["tau_g1"], 2 * m - 1)
    fill(c2, g2, sec["tau_g2"], m)
    fill(c1, g1, sec["alpha_g1"], m, coeff=7)
    fill(c1, g1, sec["beta_g1"], m, coeff=11)
    sec["beta_g2"].slice_of(buf, 0, 1)[:] = c2.write_batch(
        g2.from_affine_host([g2.host_curve.mul(g2.host_curve.generator, 11)]),
        UseCompression.NO,
    )
    print(f"  accumulator built in {time.time()-t0:.1f} s", flush=True)

    t1 = time.time()
    transcript = prepare_transcript_device(
        curve, m, bytes(buf), params,
        UseCompression.NO, CheckForCorrectness.NO, UseCompression.NO,
    )
    wall = time.time() - t1
    print(f"prepare_transcript_device @ 2^{power}: {wall:.1f} s "
          f"({4*m + m - 1} outputs, {(4*m+m-1)/wall:.0f} elt/s)", flush=True)

    # --- oracle 1: forward FFT of coeffs_g1 must reproduce tau_g1[:m] ----
    from snark_setup_tpu.ntt.group_fft import group_fft

    g1s = c1.uncompressed_size
    hdr = 2 * g1s + c2.uncompressed_size
    coeffs_g1_bytes = transcript[hdr : hdr + m * g1s]
    f1 = group_fft(curve, "g1", m)
    cpts = c1.read_batch(coeffs_g1_bytes, UseCompression.NO, CheckForCorrectness.NO)
    back = f1.fft(cpts)
    idxs = [0, 1, m // 3, m // 2, m - 1]
    sub = PointVec({k: jnp.asarray(np.asarray(v)[..., idxs]) for k, v in back.items()})
    aff = g1.to_affine_host(sub)
    hc = g1.host_curve
    for j, i in enumerate(idxs):
        expect = hc.mul(hc.generator, pow(tau, i, spec.r))
        assert aff[j] == expect, f"FFT(coeffs_g1)[{i}] != tau^{i} G"
    print("  oracle 1 OK: FFT(coeffs_g1) matches tau powers at sampled lanes", flush=True)

    # --- oracle 2: h-query spot-check vs host math -----------------------
    h_off = hdr + (3 * m) * g1s + m * c2.uncompressed_size
    for i in (0, m // 2, m - 2):
        hb = transcript[h_off + i * g1s : h_off + (i + 1) * g1s]
        from snark_setup_tpu.serialize.arkworks import g1_codec

        p = g1_codec(spec).deserialize(hb, UseCompression.NO, CheckForCorrectness.NO)
        expect = hc.add(
            hc.mul(hc.generator, pow(tau, m + i, spec.r)),
            hc.neg(hc.mul(hc.generator, pow(tau, i, spec.r))),
        )
        assert p == expect, f"h[{i}] mismatch"
    print("  oracle 2 OK: h-query matches host math at sampled indices", flush=True)
    print(f"RESULT power={power} wall={wall:.1f}s oracle=OK", flush=True)


if __name__ == "__main__":
    main()
