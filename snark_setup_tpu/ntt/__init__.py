"""Number-theoretic transforms over scalar fields and group elements.

Reference capability: ark-poly `GeneralEvaluationDomain::ifft` applied to
projective curve points inside `Groth16Params::new`
(setup-utils/src/groth16_utils.rs:44-53). Here the transform runs on TPU:
each butterfly stage is one batched constant-time scalar-mul kernel over
half the points plus a batched group add/sub, with twiddle scalars
precomputed on host.
"""

from .domain import Radix2Domain, domain_size, fr_generator
from .group_fft import GroupFFT

__all__ = ["Radix2Domain", "domain_size", "fr_generator", "GroupFFT"]
