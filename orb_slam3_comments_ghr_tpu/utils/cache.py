"""Machine-keyed persistent-compile-cache location.

XLA:CPU AOT artifacts encode the COMPILING machine's instruction-set features
(avx512*, prefer-no-scatter, ...). Loading them on a host missing some of
those features is undefined behavior — observed here as a SIGSEGV inside
backend_compile when this container migrated across machines mid-round.
Keying the cache directory by the host's CPU feature set makes every machine
hit only artifacts it compiled itself. TPU executables are keyed by the
device generation the same way (they are portable across hosts, but keeping
one namespace per key is harmless)."""

from __future__ import annotations

import hashlib
import os
import platform


def machine_cache_dir(base: str) -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = platform.processor() or ""
    key = hashlib.sha1(
        (platform.machine() + flags).encode()
    ).hexdigest()[:12]
    d = os.path.join(base, key)
    os.makedirs(d, exist_ok=True)
    return d


def setup_compile_cache(jax, repo_root: str,
                        min_compile_secs: float = 0.5) -> str | None:
    """Point jax's persistent compilation cache at the machine-keyed dir.

    TPU backends only. The XLA:CPU AOT executable serializer in this image
    targets ISA features the host doesn't report (prefer-no-scatter/-gather)
    — both serializing and deserializing those artifacts has produced
    SIGSEGVs mid-suite — so on the CPU backend the persistent cache stays
    OFF and compiles are in-memory only."""
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    d = machine_cache_dir(os.path.join(repo_root, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return d
