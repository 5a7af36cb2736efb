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
from ttdg_mgm_tpu.ops.boxes import (  # noqa: F401
    box_area,
    cell_anchors,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    grid_anchors,
    pairwise_iou,
)
from ttdg_mgm_tpu.ops.nms import batched_nms_mask, nms_mask, topk_after_nms  # noqa: F401
from ttdg_mgm_tpu.ops.roi_align import (  # noqa: F401
    assign_fpn_levels,
    multilevel_roi_align,
    roi_align,
)
from ttdg_mgm_tpu.ops.mask_paste import paste_masks, paste_masks_np  # noqa: F401
