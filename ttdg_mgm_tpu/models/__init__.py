"""Flax model zoo: Mask R-CNN R50-FPN and heads (TPU-native, NHWC, static
shapes end-to-end).

Mirrors the capability of the reference's Detectron2 model stack
(SURVEY.md section 2.1 rows 7-10, 40): ResNet-50 with frozen BatchNorm, FPN,
RPN with pseudo-label-aware loss gating, standard ROI heads with CE/focal box
predictors and the branch-dispatch forward of
``DAobjTwoStagePseudoLabGeneralizedRCNN`` re-designed as separate jitted
functions per branch.
"""

from ttdg_mgm_tpu.models.resnet import ResNet50, FrozenBatchNorm
from ttdg_mgm_tpu.models.fpn import FPN
from ttdg_mgm_tpu.models.rpn import RPNHead, generate_proposals, rpn_losses
from ttdg_mgm_tpu.models.roi_heads import (
    BoxHead,
    BoxPredictor,
    MaskHead,
    roi_box_inference,
)
from ttdg_mgm_tpu.models.discriminator import FCDiscriminatorImg, grad_reverse
from ttdg_mgm_tpu.models.rcnn import MaskRCNN
