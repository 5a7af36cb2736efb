"""TPU compute primitives.

Every native (C++/CUDA) op the reference leans on through its dependencies
(SURVEY.md section 2.3) has a static-shape JAX/Pallas equivalent here:

==================  ======================================================
``sinkhorn``        fused log-domain Sinkhorn (pygmtools semantics)
``lap``             batched on-device Hungarian (scipy LAP semantics)
``boxes``           IoU, box encode/decode, anchors (d2 semantics)
``nms``             fixed-shape batched NMS
``roi_align``       multi-level ROIAlign, aligned=True half-pixel
``mask_paste``      28x28 mask -> image-window paste
==================  ======================================================
"""

from ttdg_mgm_tpu.ops.sinkhorn import (  # noqa: F401
    sinkhorn,
    sinkhorn_auto,
    sinkhorn_masked,
    sinkhorn_project,
)
from ttdg_mgm_tpu.ops.lap import hungarian, hungarian_auto, hungarian_scipy  # noqa: F401
