"""Process-wide JAX configuration for the ceremony engine.

Enables the persistent compilation cache (big win for the CPU test mesh and
for repeated TPU CLI invocations: the ceremony repeatedly compiles the same
batch-shaped kernels across process boundaries)."""

import os

_CONFIGURED = False


def configure_jax() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    # Persistent compilation cache is opt-in: cache *reads* happen on every
    # dispatch (including tiny eager ops) and cost ~50ms each on this
    # filesystem, which dwarfs the compile time they save.
    cache_dir = os.environ.get("SNARK_SETUP_JAX_CACHE")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:  # older jax without these flags
            pass
    _CONFIGURED = True
