"""Test configuration: force an 8-device virtual CPU platform so sharding /
multi-chip logic is exercised without TPU hardware (SURVEY.md section 4)."""

import os

# Must be set before jax initializes its backends.  Force-override: the shell
# may pin JAX_PLATFORMS to the real TPU tunnel, but unit tests always run on
# the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which overrides the env var — undo it before any backend
# is initialized so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the 1-core host spends most of the suite's
# wall clock re-compiling identical XLA programs across pytest processes.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ttdg_jax_cache_cputest"))
    # XLA:CPU reports sub-second compile times even for programs whose
    # end-to-end jit (trace+lower+compile) takes minutes — cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # older jax without these flags
    pass
