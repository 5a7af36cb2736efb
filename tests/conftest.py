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

# NOTE: no persistent compilation cache here, deliberately.  On this
# jaxlib's XLA:CPU backend a cross-process cache HIT on a serialized
# executable SIGABRTs the process ("Fatal Python error: Aborted" inside
# block_until_ready, no XLA message) — reproduced deterministically with
# the 8-device-mesh source-step executable: fresh-cache run passes and
# writes entries, the next identical run loads one and dies.  The AOT
# kernel variant (jax_persistent_cache_enable_xla_caches="all") is worse:
# entries embed pseudo machine features (+prefer-no-gather/-scatter) that
# the loader rejects on the SAME host.  Cold compiles are slow but correct.
