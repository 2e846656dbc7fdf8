"""Process-wide JAX configuration for the ceremony engine.

Enables the persistent compilation cache (big win for the CPU test mesh and
for repeated TPU CLI invocations: the ceremony repeatedly compiles the same
batch-shaped kernels across process boundaries)."""

import contextlib
import os

_CONFIGURED = False


@contextlib.contextmanager
def no_persistent_cache():
    """Disable the persistent compilation cache for compiles inside this
    block (used around jits whose XLA:CPU executables segfault the cache
    serializer — jax 0.9, compilation_cache.py:265 on write / :238 on a
    later read of the poisoned entry).

    Flipping jax_enable_compilation_cache alone is INERT after the first
    compile of the process: compilation_cache.is_cache_used memoizes its
    verdict once (_cache_checked). reset_cache() clears that memo so the
    disabled flag is actually consulted. Belt and suspenders, we ALSO
    raise persistent_cache_min_compile_time_secs to infinity — compiler.
    _cache_write consults that config LIVE immediately before
    put_executable_and_time, so writes are blocked even on paths where
    the memoized cache verdict survives. On-disk entries are unaffected."""
    import jax

    try:
        from jax._src import compilation_cache as _cc
    except Exception:  # pragma: no cover - private API moved
        _cc = None

    def _reset():
        if _cc is not None:
            try:
                _cc.reset_cache()
            except Exception:  # pragma: no cover
                pass

    prev = jax.config.jax_enable_compilation_cache
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e18)
    _reset()
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        _reset()


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
        # Scope the cache per machine: XLA:CPU AOT results bake in the
        # compiling host's CPU feature set, and jax's cache key does NOT —
        # loading an entry produced on a different box emits "machine
        # features mismatch" warnings and can SIGILL/segfault mid-test
        # (observed 2026-08-21: round-2 cache entries crashed round-3's
        # box inside backend_compile_and_load). A cpuinfo-flags hash keys
        # the subdirectory so every machine builds its own entries.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next(
                    (ln for ln in f if ln.startswith("flags")), ""
                )
            tag = hashlib.blake2s(flags.encode(), digest_size=6).hexdigest()
        except OSError:  # non-Linux: fall back to a shared dir
            tag = "any"
        # Key per BACKEND too: CPU entries written by pre-round-4 runs
        # include the crash-prone deep-ladder executables whose
        # DESERIALIZE also segfaults (compilation_cache.py:238) — a
        # backend-split directory strands those poisoned entries and
        # keeps the (healthy, expensive) TPU entries separate.
        try:
            import jax as _jax

            backend = _jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "unknown"
        cache_dir = os.path.join(cache_dir, f"{tag}-{backend}")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            # XLA:CPU segfaults on the DEEP ladder executables, two ways
            # (jax 0.9, measured round 4):
            # 1. COMPILE (backend_compile_and_load) overflows the default
            #    8 MB stack — cured by `ulimit -s 262144` in the runner
            #    scripts (the main-thread stack cannot grow after start).
            # 2. Executable SERIALIZE (cache write, compilation_cache.py
            #    :265) crashes even WITH the big stack — not stack-bound.
            # CPU backends therefore never write cache entries (reads of
            # existing entries still work); TPU backends, whose
            # serializer is fine (300 MB of entries across rounds), keep
            # full caching. SNARK_SETUP_CPU_CACHE_WRITES=1 re-enables at
            # your own risk (A/B experiments).
            if jax.default_backend() == "cpu" and os.environ.get(
                "SNARK_SETUP_CPU_CACHE_WRITES", "0"
            ) not in ("1", "on", "true"):
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1e18
                )
        except Exception:  # older jax without these flags
            pass
    _CONFIGURED = True
