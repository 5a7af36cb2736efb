"""Backend detection for kernel gates.

The Mosaic (Pallas TPU) kernels must only be enabled when the default
backend actually executes TPU programs.  ``jax.default_backend() == "tpu"``
misses indirect TPU platforms: the axon tunnel registers its platform as
``"axon"`` while compiling to a real TPU chip — with the naive check the
fused GA-GM kernel silently fell back to the unfused lax solver on the
production device (measured: ~8 s instead of ~8 ms per MGM solve).
"""

from __future__ import annotations

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend() -> bool:
    """True when jitted programs run on a (possibly tunneled) TPU chip."""
    if jax.default_backend().lower() in _TPU_PLATFORMS:
        return True
    try:
        return any(d.platform.lower() in _TPU_PLATFORMS for d in jax.devices())
    except RuntimeError:  # no backend available at all
        return False
