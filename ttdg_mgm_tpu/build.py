"""Config -> model / optimizer / trainer construction.

The equivalent of d2's registry-driven builders (``build_model``,
``build_optimizer``, ``build_lr_scheduler``) for the single flagship
meta-architecture; the reference's registry strings
(``DAobjTwoStagePseudoLabGeneralizedRCNN``, ``PseudoLabRPN``,
``StandardROIHeadsPseudoLab``) map onto constructor options here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.config import CfgNode
from ttdg_mgm_tpu.models import MaskRCNN
from ttdg_mgm_tpu.solver.build import (
    build_optimizer,
    warmup_cosine_schedule,
    warmup_multistep_schedule,
    warmup_two_stage_schedule,
)


def build_model(cfg: CfgNode) -> MaskRCNN:
    return MaskRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        univ_size=cfg.MODEL.GRAPH.UNIV_SIZE,
        sample_dist=cfg.MODEL.GRAPH.SAMPLE_DIST,
        node_cap_per_level=max(cfg.MODEL.GRAPH.MAX_NODES // 5, 4),
        dis_type=cfg.SEMISUPNET.DIS_TYPE,
        cls_loss_type=cfg.MODEL.ROI_HEADS.LOSS,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
        pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        post_nms_topk=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        backbone_name=("vgg16" if "vgg" in cfg.MODEL.BACKBONE.NAME else "resnet50"),
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        mask_on=cfg.MODEL.MASK_ON,
        score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        box_fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
        box_num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
        sk_iters=cfg.MODEL.GRAPH.SK_ITERS,
        sk_tau=cfg.MODEL.GRAPH.SK_TAU,
        hippi_iters=cfg.MODEL.GRAPH.HIPPI_ITERS,
        gagm_iters=cfg.MODEL.GRAPH.GAGM_ITERS,
        lap_polish_iters=cfg.MODEL.GRAPH.LAP_POLISH_ITERS,
        compute_dtype=(
            "bfloat16" if (cfg.SOLVER.AMP.ENABLED or cfg.TPU.PRECISION == "bfloat16")
            else "float32"
        ),
    )


def build_schedule(cfg: CfgNode):
    name = cfg.SOLVER.get("LR_SCHEDULER_NAME", "WarmupMultiStepLR")
    if name == "WarmupCosineLR":
        return warmup_cosine_schedule(
            cfg.SOLVER.BASE_LR, cfg.SOLVER.MAX_ITER,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        )
    if name == "WarmupTwoStageMultiStepLR":
        return warmup_two_stage_schedule(
            cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.FACTOR_LIST,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        )
    return warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        warmup_iters=cfg.SOLVER.WARMUP_ITERS,
        warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
    )


def init_params(cfg: CfgNode, model: MaskRCNN, seed: int = 0):
    """Initialize params (cheap 64x64 trace), then optionally load converted
    reference weights (``MODEL.WEIGHTS``)."""
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64.0, 64.0]]),
    )["params"]
    weights = cfg.MODEL.WEIGHTS
    if weights:
        import os

        if os.path.exists(weights):
            from ttdg_mgm_tpu.checkpoint.converter import load_reference_checkpoint

            prefer = "modelStudent" if cfg.TEST.EVAL_STU else "modelTeacher"
            loaded = load_reference_checkpoint(
                weights, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES, prefer=prefer
            )
            params = _merge_params(params, loaded)
    return params


def _merge_params(params, loaded):
    """Name/shape-matched merge with shape-mismatch skip (reference
    ``detection_checkpoint.py:66-93`` semantics)."""
    import numpy as np

    def merge(p, l, path=""):
        if isinstance(p, dict):
            return {
                k: merge(v, l.get(k), path + "/" + k) if isinstance(l, dict) else v
                for k, v in p.items()
            }
        if l is None:
            return p
        l = np.asarray(l)
        if tuple(l.shape) != tuple(p.shape):
            return p
        return jnp.asarray(l, p.dtype)

    return merge(params, loaded)


def build_mesh(cfg: CfgNode):
    """Data-parallel device mesh per ``TPU.MESH_SHAPE`` (the reference's
    d2 ``launch``/DDP equivalent, SURVEY.md section 2.2).  ``None`` on a
    single device — the steps are mesh-polymorphic either way."""
    from ttdg_mgm_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) <= 1:
        return None
    shape = list(cfg.TPU.MESH_SHAPE)
    model_axis = shape[1] if len(shape) == 2 and shape[1] > 0 else 1
    n_data = shape[0] if shape and shape[0] > 0 else len(devices) // model_axis
    return make_mesh(devices[: n_data * model_axis], model_axis=model_axis)


def build_trainer(cfg: CfgNode, *, seed: int = 0):
    """Trainer dispatch by ``SEMISUPNET.Trainer`` (reference
    ``train_net.py:39-44``: "baseline" vs "ateacher")."""
    from ttdg_mgm_tpu.engine.mean_teacher import ATeacherTrainer
    from ttdg_mgm_tpu.engine.trainer import BaselineTrainer

    model = build_model(cfg)
    params = init_params(cfg, model, seed)
    tx = build_optimizer(
        params, build_schedule(cfg), momentum=cfg.SOLVER.MOMENTUM,
        weight_decay=cfg.SOLVER.WEIGHT_DECAY,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        clip_gradients=dict(cfg.SOLVER.CLIP_GRADIENTS),
    )
    train_sizes = list(cfg.INPUT.MIN_SIZE_TRAIN)
    common = dict(
        canvas=_canvas_size(cfg),
        min_size=cfg.INPUT.MIN_SIZE_TEST,
        max_size=cfg.INPUT.MAX_SIZE_TEST,
        gt_cap=cfg.TPU.MAX_GT_PER_IMAGE,
        mesh=build_mesh(cfg),
        # reference multi-scale train resize (INPUT.MIN_SIZE_TRAIN "choice");
        # sizes above the static canvas are fit-to-canvas by the loader
        train_min_sizes=(tuple(train_sizes)
                         if cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING == "choice"
                         and len(train_sizes) > 0 else None),
    )
    if cfg.SEMISUPNET.Trainer == "ateacher":
        return ATeacherTrainer(
            model, tx, params,
            ema_keep_rate=cfg.SEMISUPNET.EMA_KEEP_RATE or 0.9996,
            teacher_update_iter=cfg.SEMISUPNET.TEACHER_UPDATE_ITER,
            burn_up_step=cfg.SEMISUPNET.BURN_UP_STEP,
            unsup_weight=cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT,
            dis_weight=cfg.SEMISUPNET.DIS_LOSS_WEIGHT,
            pseudo_threshold=cfg.SEMISUPNET.BBOX_THRESHOLD,
            cross_domain=cfg.SEMISUPNET.CROSS_DOMAIN_MATCHING,
            sup_percent=(cfg.DATALOADER.SUP_PERCENT
                         if cfg.DATALOADER.SUP_PERCENT < 100.0 else None),
            split_seed=cfg.DATALOADER.RANDOM_DATA_SEED,
            **common,
        )
    return BaselineTrainer(model, tx, params, **common)


def _canvas_size(cfg: CfgNode) -> int | str:
    if cfg.TPU.TRAIN_CANVAS == "auto":
        # reference-faithful train geometry: rectangular per-batch buckets
        return "auto"
    d = cfg.TPU.IMAGE_DIVISIBILITY
    return ((cfg.INPUT.MIN_SIZE_TEST + d - 1) // d) * d
