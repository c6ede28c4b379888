"""Persistent XLA compilation cache.

First TPU compiles of the big train steps take minutes (and the axon tunnel
adds warm-up variance); the persistent cache makes every subsequent process
start near-instant for unchanged programs. Called by every CLI entry point.

CPU caveat (hard-won, 2026-08-20): the cache is scoped to the TPU backend
ONLY. XLA:CPU cache entries are AOT machine code compiled for the exact host
CPU — this VM migrates between machines with different avx512/amx feature
sets, and loading a stale entry on a narrower host logs
``cpu_aot_loader ... Target machine feature ... not supported`` and can
SIGILL/segfault the process (observed: time_to_quality --platform cpu died
rc=139 loading another machine's entries).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    try:
        # Never serve/persist CPU executables: they are host-specific AOT
        # code and this VM migrates between heterogeneous machines (see
        # module docstring). Backend inspection must not TOUCH the default
        # backend (that could initialize a wedged axon plugin) — read the
        # configured platform instead, which every CPU-forcing caller sets.
        plats = (jax.config.jax_platforms or "") if hasattr(
            jax.config, "jax_platforms") else ""
        if "cpu" in str(plats).split(",")[:1]:
            return
        if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
            return
    except Exception:
        pass

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        _wipe_if_host_changed(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


def _wipe_if_host_changed(cache_dir: str) -> None:
    """Purge the cache when the host CPU changed since it was written.

    Even TPU-backend runs compile small programs on the CPU backend (module
    .init under jax.default_device(cpu)); entries over the persistence bar
    are host-specific AOT code (see module docstring). One wipe per migration
    costs a few warm-up compiles; a stale entry can kill the process."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        fp = hashlib.sha256(flags.encode()).hexdigest()[:16]
    except OSError:
        return
    marker = os.path.join(cache_dir, ".host_fingerprint")
    try:
        with open(marker) as f:
            if f.read().strip() == fp:
                return
        for name in os.listdir(cache_dir):
            if name != ".host_fingerprint":
                try:
                    os.remove(os.path.join(cache_dir, name))
                except OSError:
                    pass
    except FileNotFoundError:
        pass
    with open(marker, "w") as f:
        f.write(fp)
