"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Tests verify numerics (gradient fidelity vs Ridders finite differences) and
multi-device sharding; both want CPU + x64. Benchmarks (bench.py) run
separately on the real TPU in f32/bf16.

NOTE: the session environment pins JAX_PLATFORMS to the tunneled TPU and
ignores the env-var override, so we force the platform through jax.config
(which wins) before any backend is initialized.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("NT_TEST_DEVICES", "8")))
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: this host has 1 CPU core and jit compiles
# dominate suite time; repeat runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/nt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
