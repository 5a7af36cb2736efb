"""TTDG-MGM-TPU: a TPU-native JAX framework for test-time domain generalization
via universe learning and multi-graph matching (CVPR 2025, arXiv 2503.13012).

This is a ground-up JAX/XLA/Pallas re-design of the capabilities of the
reference PyTorch/Detectron2 implementation (Yore0/TTDG-MGM):

* Mask R-CNN R50-FPN instance segmentation (medical images: fundus OD/OC,
  polyps), built with static shapes end-to-end so the whole forward +
  adaptation step compiles to a single XLA program.
* Supervised universe learning (``U_sup``: Sinkhorn + HiPPI) fused into the
  source-training step.
* Test-time adaptation by unsupervised multi-graph matching
  (``MGM3``: pairwise affinity -> Sinkhorn -> Graduated-Assignment MGM),
  one optimizer step per test batch, all on device.
* Data-parallel (and mesh-ready) scaling via ``jax.sharding`` + ``jit``.

Layout mirrors the reference's layer map (SURVEY.md section 1):

==============  =====================================================
``config``      yacs-style config tree with ``_BASE_`` inheritance
``data``        dataset registry, COCO parsing, aug, static batching
``ops``         TPU compute primitives (sinkhorn, LAP, ROIAlign, NMS...)
``graph``       graph construction + multi-graph-matching solvers
``models``      Flax Mask R-CNN (backbone/FPN/RPN/ROI heads) + heads
``engine``      trainers: source, TTA, mean-teacher
``evaluation``  Dice / E-measure / S-measure, COCO AP
``solver``      optimizers and LR schedules (optax)
``parallel``    device mesh + sharding helpers
==============  =====================================================
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the full Mask R-CNN + GA-GM programs take
# minutes to compile on a single host core; caching makes every process after
# the first (tests, bench, driver entries) start warm.  Opt out with
# TTDG_NO_COMPILATION_CACHE=1.
import os as _os

if not _os.environ.get("TTDG_NO_COMPILATION_CACHE"):
    # scope by XLA_FLAGS: entries compiled under the virtual-device CPU flags
    # carry different target-machine features and must not be loaded into a
    # differently-flagged process (XLA warns about possible SIGILL).
    import hashlib as _hashlib

    _flavor = _hashlib.md5(
        _os.environ.get("XLA_FLAGS", "").encode()
    ).hexdigest()[:8]
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      f"ttdg_jax_cache_{_flavor}"),
    )
    try:
        import jax as _jax

        # Respect a cache the embedding process already configured (the test
        # conftest points at its own dir with min_compile_time=0.0 because
        # XLA:CPU under-reports compile times; clobbering that setting here
        # silently disabled caching for the whole suite).
        if _jax.config.jax_compilation_cache_dir is None:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
del _os
