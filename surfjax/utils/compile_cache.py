"""Persistent XLA compilation cache (SURVEY.md §5.6 config system).

Why this exists (round-4 measurement): on this host the TPU is reached
through the axon relay, and a process's FIRST compile pays a large
workload-independent relay cost — a 256x256 c1 render measured 387.6 s
process-cold vs **13.0 s** in a fresh process with this cache populated
(~30x; the relay overhead is tied to compile RPCs, not backend init).
Without it, judge-facing entry points (bench.py compiles three settings
variants of the 48-frame sequence kernel) can exceed a 10-minute
watchdog from cold — the same failure class as round 3's lost driver
artifacts, just slower. The cache also speeds CPU test-suite re-runs.

Mechanics: JAX's own persistent cache (``jax_compilation_cache_dir``)
keyed on the serialized HLO + compile options + platform, so code or
flag changes miss cleanly and recompile; entries are the exact
executables XLA produced (bitwise-identical replays). The default
location is ``<repo>/.jax_cache/<fingerprint>`` (gitignored) — kept
inside the repo deliberately: this environment must not write outside
it.

Why the ``<fingerprint>`` subdirectory (r5): the repo — and so this
cache — is shared with the driver/judge containers, and **JAX's cache
key does not include XLA:CPU target machine features**, so an entry
compiled by a different jaxlib or on a different-featured host would
be deserialized here blind. Scoping the cache by a fingerprint of
(machine CPU flags, jax/jaxlib version + install path, XLA_FLAGS,
JAX_PLATFORMS, axon relay env) makes cross-context loads structurally
impossible while keeping same-context replays (the 387.6 s -> 13.0 s
relay win runs in one context). NOTE an initial r5 mis-diagnosis, for
the record: ``cpu_aot_loader.cc`` warns about
``+prefer-no-scatter/+prefer-no-gather`` target features on EVERY
load, including entries this same host wrote hours earlier — this
jaxlib appends those LLVM tuning features at compile time and the
loader's feature check mis-flags them; the warning is cosmetic, and
the r5 suite SIGSEGV was in-process executable accumulation (fixed in
tests/conftest.py via per-module ``jax.clear_caches()``), not foreign
cache entries (docs/ROUND5.md §8a).

Env knob: ``SURFJAX_COMPILE_CACHE`` — a directory path overrides the
default root (the fingerprint subdir still applies); ``0``/``off``/
``none`` disables the cache entirely. An explicit JAX-level
``JAX_COMPILATION_CACHE_DIR`` wins untouched (no fingerprint): that
path means the user took full control.
"""

from __future__ import annotations

import os

_ENABLED: bool | None = None


def context_fingerprint() -> str:
    """12-hex digest of everything that changes what an XLA compile
    produces but is NOT in JAX's cache key: host CPU features (the
    judge/driver containers differ), the jax/jaxlib build (version and
    install path), XLA_FLAGS, the platform selection, and the axon
    relay configuration (remote_compile moves compilation to another
    host entirely)."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        import jax
        import jaxlib
        parts += [jax.__version__, jaxlib.__version__,
                  os.path.dirname(jax.__file__)]
    except Exception:  # pragma: no cover - jax always importable here
        parts.append("no-jax")
    parts.append(os.environ.get("XLA_FLAGS", ""))
    parts.append(os.environ.get("JAX_PLATFORMS", ""))
    parts.extend(f"{k}={v}" for k, v in sorted(os.environ.items())
                 if k.startswith(("PALLAS_AXON", "AXON_")))
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:  # pragma: no cover - non-/proc platforms
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache() -> bool:
    """Idempotently point JAX at the repo-local persistent compile cache.

    Returns True when the cache is active. Called from
    ``surfjax/__init__`` so every entry point (bench, tools, tests, the
    driver's ``__graft_entry__``) shares one cache; safe before or after
    backend initialization (JAX reads the config per compile call).
    """
    global _ENABLED
    if _ENABLED is not None:
        return _ENABLED
    knob = os.environ.get("SURFJAX_COMPILE_CACHE", "")
    if knob.lower() in ("0", "off", "none", "disable", "disabled"):
        _ENABLED = False
        return False
    root = knob or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        import jax

        # entries must never cross compile contexts (module docstring:
        # a foreign-container XLA:CPU AOT entry segfaulted the suite)
        cache_dir = os.path.join(root, context_fingerprint())

        # an explicit JAX-level setting wins: don't clobber a cache dir
        # the user already configured via JAX_COMPILATION_CACHE_DIR or
        # jax.config before `import surfjax` (advisor r4)
        existing = jax.config.jax_compilation_cache_dir
        if existing:
            _ENABLED = True
            return True
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >=0.5 s to compile (the default 1.0 s
        # would skip many of the suite's small CPU kernels; going lower
        # bloats the dir with trivial entries)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _ENABLED = True
    except Exception as e:  # pragma: no cover - config API drift / RO repo
        # a silently-dead cache would bring back the 387.6 s relay
        # cold-compile (and its 10-min-watchdog failure mode) with zero
        # diagnostic — say so once on stderr (advisor r4)
        import sys
        print(f"surfjax: persistent compile cache DISABLED "
              f"({type(e).__name__}: {e}) — cold compiles will be slow",
              file=sys.stderr)
        _ENABLED = False
    return _ENABLED
