"""Test config: run on an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication; the driver validates
the real multi-chip path separately via __graft_entry__.dryrun_multichip).

Note: this image preloads jax with platform 'axon' (real TPU tunnel) via
sitecustomize, so env vars are too late — switch the platform through
jax.config before any backend is touched."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)  # float32 everywhere, as on TPU
# persistent compile cache: repeat suite runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
