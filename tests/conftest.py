"""Test config: run on an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication; the driver validates
the real multi-chip path separately via __graft_entry__.dryrun_multichip).

Note: this image preloads jax with platform 'axon' (real TPU tunnel) via
sitecustomize, so env vars are too late — switch the platform through
jax.config before any backend is touched."""

import os as _os0

# XLA:CPU's parallel LLVM codegen has segfaulted sporadically in long
# single-process runs on this image (always inside backend_compile, three
# different call sites, never reproducible in shorter runs) — serialize it.
# Must be set before the backend initializes; jax is already imported by
# sitecustomize but no backend exists yet.
_os0.environ["XLA_FLAGS"] = (
    _os0.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_parallel_codegen_split_count=1"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)  # float32 everywhere, as on TPU
# persistent compile cache, keyed by host CPU features: XLA:CPU AOT results
# from a DIFFERENT machine can SIGSEGV on load (utils/cache.py)
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
from orb_slam3_comments_ghr_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax, _os.path.join(_os.path.dirname(__file__), ".."))

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_accumulation():
    """Drop compiled executables between test MODULES. A single pytest
    process otherwise accumulates every jitted program of all ~40 modules in
    the XLA:CPU JIT engine, which has crashed (SIGSEGV/SIGABRT inside
    backend_compile) deterministically around the ~150th test on this image.
    Per-module recompiles cost seconds; the bounded footprint keeps the
    long-lived process stable."""
    yield
    jax.clear_caches()
