"""Pallas TPU kernels for the hot ops.

The XLA paths in ``ttdg_mgm_tpu.ops`` are the semantics of record (and the
CPU/interpret fallbacks); these kernels are drop-in replacements keeping the
whole computation in VMEM.  Selection is automatic: on TPU backends the
Pallas path is used, elsewhere the XLA path.
"""

from ttdg_mgm_tpu.ops.pallas.sinkhorn_pallas import sinkhorn_pallas
