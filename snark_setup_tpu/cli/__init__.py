"""CLI layer (L4): file IO, mmap, hash side-files, command dispatch.

Mirrors phase1-cli/src/* and phase2-cli/src/* of the reference: each command
opens files, memory-maps them, enforces expected byte lengths, calls the
buffer-level protocol layer, and writes `.hash` side files.
"""

from .phase1_cmds import (
    combine,
    contribute,
    new_challenge,
    split,
    transform_pok_and_correctness,
    transform_ratios,
)

__all__ = [
    "new_challenge",
    "contribute",
    "transform_pok_and_correctness",
    "transform_ratios",
    "combine",
    "split",
]
