"""Persistent XLA compilation cache.

The acoustic model's bucketed shapes compile to ~48 distinct XLA
programs (BENCHMARKS.md "recompile audit"); at ~30 s each on TPU, the
first epoch carries ~24 minutes of one-time compile tax.  JAX can
persist compiled executables to disk and reload them across processes —
this module turns that on for every framework entry point (trainers,
server, bench) so the tax is paid once per machine, not once per run.

The reference (torch eager) has no compile step and therefore no
counterpart; this is TPU-native operational surface.
"""

from __future__ import annotations

import logging
import os

_enabled_dir: str | None = None


def default_cache_dir() -> str:
    return os.environ.get(
        "MSA_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "msa_tts_tpu", "xla_cache"
        ),
    )


def _cpu_only_host() -> bool:
    """True when this process will run XLA:CPU only.

    Checked in order: the JAX_PLATFORMS env var, the in-process
    ``jax.config`` override (what ``dryrun_multichip`` sets), and —
    only when neither names a platform — ``jax.default_backend()``.
    The last check initializes the backend, which is safe exactly when
    nothing points at a remote accelerator (a dead device relay would
    hang it; with the env var set we never reach it)."""
    for raw in (
        os.environ.get("JAX_PLATFORMS", ""),
        _jax_platforms_config(),
    ):
        plats = [p.strip().lower() for p in str(raw).split(",") if p.strip()]
        if plats:
            return all(p == "cpu" for p in plats)
    try:
        import jax

        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover - env-dependent
        return False


def _jax_platforms_config() -> str:
    try:
        import jax

        return jax.config.jax_platforms or ""
    except Exception:  # pragma: no cover - old jax
        return ""


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$MSA_COMPILATION_CACHE_DIR`` or ``~/.cache/msa_tts_tpu/xla_cache``).

    Idempotent; returns the active cache dir, or None if the cache could
    not be enabled (old jax, read-only filesystem) — callers proceed
    uncached in that case.
    """
    global _enabled_dir
    if _enabled_dir is not None:
        if path is not None and path != _enabled_dir:
            logging.getLogger(__name__).warning(
                "compilation cache already enabled at %s; ignoring "
                "requested %s (jax_compilation_cache_dir is "
                "process-global)", _enabled_dir, path
            )
        return _enabled_dir
    # On CPU-only hosts the cache is opt-in (explicit path argument or
    # $MSA_COMPILATION_CACHE_DIR): CPU compiles are cheap, and XLA:CPU
    # reloads persisted AOT results with machine-feature checks that
    # log loudly (and can in principle SIGILL) when the entry was built
    # under different flags.  The ~24-minute tax this cache exists for
    # is the TPU program set (BENCHMARKS.md recompile audit).
    explicit = path is not None or "MSA_COMPILATION_CACHE_DIR" in os.environ
    if not explicit and _cpu_only_host():
        return None
    path = path or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Persist anything that took meaningful compile time; the
        # decoder scan programs are seconds-to-minutes each.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - env-dependent
        logging.getLogger(__name__).warning(
            "persistent compilation cache unavailable (%s); "
            "compiles will not be reused across processes", e
        )
        return None
    _enabled_dir = path
    return path
