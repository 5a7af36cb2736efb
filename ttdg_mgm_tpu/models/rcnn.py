"""Mask R-CNN meta-architecture with branch-dispatch re-designed as methods.

Capability of reference ``DAobjTwoStagePseudoLabGeneralizedRCNN``
(``adapteacher/modeling/meta_arch/rcnn.py:67-420``): R50-FPN Mask R-CNN plus
an image-level domain discriminator (GRL) and the two graph-matching modules
(supervised universe learner + unsupervised TTA matcher), with the string
branch dispatch (``supervised_source`` / ``supervised_target`` /
``unsup_data_weak`` / ``TTT`` / ``domain`` / inference) turned into separate
jittable methods (SURVEY.md section 7.1):

==========================  =============================================
``forward_inference``       full detection + mask inference (eval path)
``loss_supervised``         det losses + ``loss_matching`` (U_sup)
``loss_ttt``                proposals -> nodes -> MGM3 TTA loss
``loss_domain``             GRL + BCE on the ``dis_type`` FPN level
``proposals_weak``          box inference only (teacher pseudo-labels)
==========================  =============================================

Batch layout (static shapes): images ``(B, H, W, 3)`` float32 RGB 0-255
(padded), ``image_sizes (B, 2)`` valid (h, w); GT as padded
``(B, Kgt, ...)`` with validity masks; GT masks rasterized on host at a fixed
``(mask_res, mask_res)`` canvas covering the padded image.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.graph.cross_domain import CrossDomainGraphHead
from ttdg_mgm_tpu.graph.mgm import MGM3Unsup
from ttdg_mgm_tpu.graph.node_sampler import PrototypeComputation
from ttdg_mgm_tpu.graph.universe import USup
from ttdg_mgm_tpu.models.discriminator import FCDiscriminatorImg, grad_reverse
from ttdg_mgm_tpu.models.fpn import FPN
from ttdg_mgm_tpu.models.resnet import ResNet50
from ttdg_mgm_tpu.models.roi_heads import (
    BoxHead,
    BoxPredictor,
    MaskHead,
    crop_gt_masks,
    fast_rcnn_losses,
    label_and_sample_proposals,
    mask_loss,
    roi_box_inference,
)
from ttdg_mgm_tpu.models.rpn import (
    RPNHead,
    generate_proposals,
    level_anchors,
    rpn_losses,
)
from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
    multilevel_roi_align_windowed,
    multilevel_roi_align_windowed_train,
    use_windowed_pool,
    use_windowed_train_pool,
)
from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

# d2 defaults (Base-RCNN-FPN): caffe-era pixel stats, RGB format quirk kept
PIXEL_MEAN = (103.530, 116.280, 123.675)
PIXEL_STD = (1.0, 1.0, 1.0)


def _bce_with_logits_mean(logits, target_value):
    x = jnp.clip(logits, -30, 30)
    t = jnp.full_like(x, target_value)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


class MaskRCNN(nn.Module):
    num_classes: int = 2
    univ_size: int = 32
    sample_dist: int = 10
    node_cap_per_level: int = 20
    dis_type: str = "p2"
    cls_loss_type: str = "CrossEntropy"  # or "FocalLoss"
    pixel_mean: Sequence[float] = PIXEL_MEAN
    pixel_std: Sequence[float] = PIXEL_STD
    # proposal budgets (d2 Base-RCNN-FPN)
    pre_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk: int = 1000
    detections_per_image: int = 100
    batch_size_per_image: int = 512
    mask_fg_cap: int = 128
    compute_dtype: str = "float32"  # "bfloat16" for TPU throughput
    backbone_name: str = "resnet50"  # or "vgg16" (reference build_vgg_backbone)
    # matching-solver budgets (reference defaults, SURVEY §2.4; wired from
    # cfg.MODEL.GRAPH.* so tests/ablations can shrink the solver orbits)
    sk_iters: int = 20
    sk_tau: float = 0.05
    hippi_iters: int = 50
    gagm_iters: int = 200
    # iteration cap of the exact-LAP Hungarian finale inside the fused GA-GM
    # kernel (cfg.MODEL.GRAPH.LAP_POLISH_ITERS); default 200 = the
    # reference's full-length hungarian-projector round
    # (multi_graph_matching.py:374-387), now ~free in VMEM
    lap_polish_iters: int = 200
    # bottleneck stage depths: 50 -> (3,4,6,3); 101 -> (3,4,23,3);
    # 152 -> (3,8,36,3); small non-standard depths (14, 26) for fast tests
    resnet_depth: int = 50
    # res2 width (doubles per stage); 256 = the R50 standard, smaller for
    # test fixtures (tests/test_tta_improves_dice.py golden weights)
    resnet_width: int = 256
    # d2 MODEL.BACKBONE.FREEZE_AT (reference default 2 = stem+res2): frozen
    # stages end in stop_gradient so their backward is never computed —
    # torch requires_grad=False semantics, not just masked updates.  The
    # optimizer's trainable_mask (solver/build.py) independently zeroes the
    # same leaves' updates, so either knob alone keeps updates frozen.
    freeze_at: int = 2
    # detection-only mode (reference MODEL.MASK_ON=False, test_detection.yaml)
    mask_on: bool = True
    # detection thresholds (d2 cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST /
    # NMS_THRESH_TEST / POSITIVE_FRACTION, cfg.MODEL.RPN.NMS_THRESH)
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    roi_positive_fraction: float = 0.25
    rpn_nms_thresh: float = 0.7
    # ROIAlign sampling grid (d2 cfg.MODEL.ROI_*_HEAD.POOLER_SAMPLING_RATIO;
    # the reference's poolers run the d2 default 0 = ADAPTIVE ceil(bin_size)
    # per ROI/axis — reproduced exactly on a static sample budget, see
    # ops/roi_align.py.  2 = the static grid (round<=4 legacy convention).
    pooler_sampling_ratio: int = 0
    # architecture widths (d2 cfg.MODEL.FPN.OUT_CHANNELS, ROI_BOX_HEAD.FC_DIM
    # / NUM_FC, ROI_MASK_HEAD.CONV_DIM / NUM_CONV, ANCHOR_GENERATOR.SIZES)
    fpn_channels: int = 256
    box_fc_dim: int = 1024
    box_num_fc: int = 2
    mask_conv_dim: int = 256
    mask_num_conv: int = 4
    anchor_sizes: Sequence = ((32,), (64,), (128,), (256,), (512,))

    def setup(self):
        # flax computation dtype: threading bf16 through every conv/dense
        # keeps the BACKWARD activation-cotangent chain in bf16 too (without
        # it, f32 params promote and autodiff drags f32 cotangents through the
        # backbone — measured ~25 ms/step extra at 800 px batch 4).  Params
        # stay f32 (param_dtype default); grads arrive f32 through the cast
        # transpose — torch-AMP semantics, reference SOLVER.AMP.
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        if self.backbone_name == "vgg16":
            from ttdg_mgm_tpu.models.vgg import VGG16FPNBackbone

            self.backbone = VGG16FPNBackbone()
        else:
            stages = {14: (1, 1, 1, 1), 26: (2, 2, 2, 2), 50: (3, 4, 6, 3),
                      101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.resnet_depth]
            self.backbone = ResNet50(stage_blocks=stages,
                                     stage_width=self.resnet_width,
                                     freeze_at=self.freeze_at, dtype=dt)
        self.fpn = FPN(self.fpn_channels, dtype=dt)
        self.rpn_head = RPNHead(channels=self.fpn_channels, dtype=dt)
        self.box_head = BoxHead(fc_dim=self.box_fc_dim, num_fc=self.box_num_fc,
                                dtype=dt)
        self.box_predictor = BoxPredictor(self.num_classes, dtype=dt)
        self.mask_head = MaskHead(self.num_classes, channels=self.mask_conv_dim,
                                  num_conv=self.mask_num_conv, dtype=dt)
        # discriminator width follows the dis_type feature (reference
        # ``rcnn.py:113``: ``_out_feature_channels[dis_type]``); FPN levels
        # are all 256-wide, raw backbone stages widen with depth
        dis_ch = {"res2": 256, "res3": 512, "res4": 1024,
                  "res5": 2048}.get(self.dis_type, self.fpn_channels)
        self.D_img = FCDiscriminatorImg(dis_ch, dtype=dt)
        # graph node dim == FPN channel width (nodes are FPN pixels)
        dim = self.fpn_channels
        self.multi_matching_sup = USup(
            self.num_classes, self.univ_size, dim=dim, sk_tau=self.sk_tau,
            sk_iter=self.sk_iters, hippi_iters=self.hippi_iters,
        )
        self.multi_matching_unsup = MGM3Unsup(
            self.num_classes, self.univ_size, dim=dim, sk_tau=self.sk_tau,
            sk_iter=self.sk_iters, mgm_iter=self.gagm_iters,
            lap_polish_iters=self.lap_polish_iters,
        )
        self.cross_domain = CrossDomainGraphHead(self.num_classes, dim=dim)
        self.graph_generator = PrototypeComputation(
            self.num_classes, self.sample_dist, self.node_cap_per_level
        )
        self.U = self.param(
            "U",
            lambda key, shape: jax.random.normal(key, shape) + 1.0 / self.univ_size,
            (self.univ_size, dim),
        )

    # -- shared feature path -------------------------------------------------

    def _normalize(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = (images - mean) / std
        if self.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        return x

    def extract_features(self, images):
        x = self._normalize(images)
        # NOTE: features leave in compute_dtype (bf16 under the AMP policy;
        # f32 params promote conv outputs back to f32, so an explicit cast is
        # needed).  Everything feature-shaped downstream (ROIAlign gathers,
        # heads, discriminator) is bandwidth-bound — f32 features doubled the
        # pooler's HBM traffic.  Precision-sensitive consumers (RPN logits,
        # graph nodes, losses) upcast their own small outputs instead.
        feats = self.fpn(self.backbone(x))
        if self.compute_dtype == "bfloat16":
            feats = {k: v.astype(jnp.bfloat16) for k, v in feats.items()}
        return feats

    def _feature_list(self, feats):
        return [feats[f"p{i}"] for i in range(2, 7)]

    def _proposals(self, feats, image_sizes, *, train: bool):
        levels = self._feature_list(feats)
        logits, regs = self.rpn_head(levels)
        # box decode / scoring in f32 (tiny tensors; bf16 box deltas cost
        # real localization error)
        logits = [l.astype(jnp.float32) for l in logits]
        regs = [r.astype(jnp.float32) for r in regs]
        anchors = level_anchors(
            [(f.shape[1], f.shape[2]) for f in levels],
            sizes=tuple(tuple(s) for s in self.anchor_sizes),
        )
        boxes, scores, valid = generate_proposals(
            logits, regs, anchors, image_sizes,
            pre_nms_topk=self.pre_nms_topk_train if train else self.pre_nms_topk_test,
            post_nms_topk=self.post_nms_topk,
            nms_thresh=self.rpn_nms_thresh,
        )
        return (logits, regs, anchors), (boxes, scores, valid)

    def _pool(self, feats, boxes, output_size: int, *, pack: bool = False):
        """Batched multi-level ROIAlign: boxes (B, K, 4) -> (B, K, P, P, C).
        The pooler is a pure function, so a plain vmap keeps the traced
        graph size independent of B (no Python unrolling).  ``pack=True``
        (corner-packed rows) for differentiated training pools only — see
        ``multilevel_roi_align``."""
        pool_feats = [feats[f"p{i}"] for i in range(2, 6)]
        ratio = self.pooler_sampling_ratio
        if not pack and use_windowed_pool():
            # forward-only pools on TPU: windowed-DMA Pallas kernel (the
            # gather formulation is row-transaction-bound; see
            # ops/pallas/roi_pool_pallas.py).  Gradient-free by design —
            # these call sites feed stop_gradient-ed detections only.
            # interpret mode when the gate is forced on off-TPU (the
            # mesh-safety tests run the production kernel path on the
            # 8-device CPU mesh with TTDG_WINDOWED_POOL=1).
            from ttdg_mgm_tpu.utils.platform import is_tpu_backend

            return multilevel_roi_align_windowed(
                pool_feats, boxes, output_size=output_size,
                sampling_ratio=ratio, interpret=not is_tpu_backend(),
            )
        if pack and use_windowed_train_pool():
            # differentiable windowed pooler for training pools (Pallas
            # scatter-accumulate backward): 249.9 vs 682.5 ms per 800px
            # batch-8 source step against the adaptive-grid gather (r5);
            # interpret mode when the gate is forced on off-TPU
            from ttdg_mgm_tpu.utils.platform import is_tpu_backend

            return multilevel_roi_align_windowed_train(
                pool_feats, boxes, output_size=output_size,
                sampling_ratio=ratio, interpret=not is_tpu_backend(),
            )
        return jax.vmap(
            lambda fs, b: multilevel_roi_align(
                fs, b, output_size=output_size, sampling_ratio=ratio,
                pack_corners=pack,
            )
        )(pool_feats, boxes)

    def _head_dtype(self, x):
        """Heads in bf16 under the AMP policy (the box head's 2 FC layers are
        the detection path's FLOPs hot spot); logits return as f32."""
        return x.astype(jnp.bfloat16) if self.compute_dtype == "bfloat16" else x

    def _box_inference(self, feats, prop_boxes, prop_valid, image_sizes):
        """Fast-rcnn inference -> top detections (B, D, ...); flax heads run
        on the flattened (B*K) roi batch, per-image NMS is vmapped."""
        B, K = prop_boxes.shape[:2]
        pooled = self._pool(feats, prop_boxes, 7)
        x = self.box_head(self._head_dtype(pooled.reshape(B * K, *pooled.shape[2:])))
        scores, deltas = self.box_predictor(x)
        scores = scores.astype(jnp.float32)
        deltas = deltas.astype(jnp.float32)
        infer = jax.vmap(
            lambda s, d, b, v, hw: roi_box_inference(
                s, d, b, v, hw, num_classes=self.num_classes,
                score_thresh=self.score_thresh_test,
                nms_thresh=self.nms_thresh_test,
                topk=self.detections_per_image,
            )
        )
        return infer(
            scores.reshape(B, K, -1), deltas.reshape(B, K, -1), prop_boxes,
            prop_valid, image_sizes,
        )

    # -- branches ------------------------------------------------------------

    def forward_inference(self, images, image_sizes):
        """Full inference: detections + per-detection mask probabilities.

        Returns dict with boxes (B, D, 4), scores, classes, valid, and
        mask_probs (B, D, 28, 28) for the predicted class.
        """
        feats = self.extract_features(images)
        _, (pboxes, pscores, pvalid) = self._proposals(feats, image_sizes, train=False)
        boxes, scores, classes, valid = self._box_inference(
            feats, pboxes, pvalid, image_sizes
        )
        B, D = scores.shape
        if not self.mask_on:
            mask_probs = jnp.zeros((B, D, 28, 28), jnp.float32)
            return {
                "boxes": boxes, "scores": scores, "classes": classes,
                "valid": valid, "mask_probs": mask_probs,
            }
        pooled = self._pool(feats, boxes, 14)
        logits = self.mask_head(
            self._head_dtype(pooled.reshape(B * D, *pooled.shape[2:]))
        ).astype(jnp.float32)
        logits = logits.reshape(B, D, *logits.shape[1:])  # (B, D, 28, 28, C)
        cls_idx = jnp.clip(classes, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            logits, cls_idx[:, :, None, None, None], axis=4
        )[..., 0]
        mask_probs = jax.nn.sigmoid(sel)
        return {
            "boxes": boxes, "scores": scores, "classes": classes, "valid": valid,
            "mask_probs": mask_probs,
        }

    def proposals_weak(self, images, image_sizes):
        """``unsup_data_weak`` branch: box detections without masks
        (teacher pseudo-label source, reference ``rcnn.py:305-330``)."""
        feats = self.extract_features(images)
        _, (pboxes, pscores, pvalid) = self._proposals(feats, image_sizes, train=False)
        boxes, scores, classes, valid = self._box_inference(
            feats, pboxes, pvalid, image_sizes
        )
        return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}

    def loss_ttt(self, images, image_sizes):
        """``TTT`` branch (reference ``rcnn.py:331-357``): box inference ->
        graph nodes from predicted boxes -> unsupervised MGM loss against the
        frozen universe."""
        feats = self.extract_features(images)
        _, (pboxes, pscores, pvalid) = self._proposals(feats, image_sizes, train=False)
        boxes, scores, classes, valid = self._box_inference(
            feats, pboxes, pvalid, image_sizes
        )
        nodes, labels, node_mask = self.graph_generator(
            self._feature_list(feats), jax.lax.stop_gradient(boxes), classes, valid
        )
        loss = self.multi_matching_unsup(
            nodes.astype(jnp.float32), labels, node_mask,
            jax.lax.stop_gradient(self.U),
        )
        return loss

    def loss_supervised(
        self, images, image_sizes, gt_boxes, gt_classes, gt_masks, gt_valid, rng,
        *, source: bool = True, with_mask: bool = True, append_gt: bool = True,
    ):
        """``supervised_source`` / ``supervised_target`` branches
        (reference ``rcnn.py:229-303``): RPN + ROI + mask losses, plus
        ``loss_matching`` (universe learning on GT-box nodes) when source."""
        feats = self.extract_features(images)
        (logits, regs, anchors), (pboxes, pscores, pvalid) = self._proposals(
            feats, image_sizes, train=True
        )
        rng_rpn, rng_roi = jax.random.split(rng)
        losses = rpn_losses(logits, regs, anchors, gt_boxes, gt_valid, rng_rpn)

        B = images.shape[0]
        S = self.batch_size_per_image
        keys = jax.random.split(rng_roi, B)

        # proposal labeling + sampling: pure per-image fn, vmapped over B
        sb, sc, sm, sfg, sv = jax.vmap(
            lambda pb, pv, gb, gc, gv, k: label_and_sample_proposals(
                pb, pv, gb, gc, gv, k, num_classes=self.num_classes,
                batch_size_per_image=S, append_gt=append_gt,
                positive_fraction=self.roi_positive_fraction,
            )
        )(pboxes, pvalid, gt_boxes, gt_classes, gt_valid, keys)

        pooled = self._pool(feats, sb, 7, pack=True)
        x = self.box_head(self._head_dtype(pooled.reshape(B * S, *pooled.shape[2:])))
        scores, deltas = self.box_predictor(x)
        scores = scores.astype(jnp.float32)
        deltas = deltas.astype(jnp.float32)
        matched_gt_boxes = jax.vmap(lambda g, m: g[m])(gt_boxes, sm)
        det = jax.vmap(
            lambda s, d, b, g, c, f, v: fast_rcnn_losses(
                s, d, b, g, c, f, v, num_classes=self.num_classes,
                cls_loss_type=self.cls_loss_type,
            )
        )(scores.reshape(B, S, -1), deltas.reshape(B, S, -1), sb,
          matched_gt_boxes, sc, sfg, sv)
        losses["loss_cls"] = jnp.mean(det["loss_cls"])
        losses["loss_box_reg"] = jnp.mean(det["loss_box_reg"])

        if with_mask and self.mask_on:
            cap = self.mask_fg_cap

            def compact_fg(boxes, cls, matched, fg):
                order = jnp.cumsum(fg.astype(jnp.int32)) - 1
                slot = jnp.where(fg & (order < cap), order, cap)
                fb = jnp.zeros((cap + 1, 4)).at[slot].set(boxes)[:cap]
                fc = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(cls)[:cap]
                fm = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(matched)[:cap]
                n_fg = jnp.minimum(jnp.sum(fg.astype(jnp.int32)), cap)
                return fb, fc, fm, jnp.arange(cap) < n_fg, n_fg

            fg_boxes, fg_cls, fg_matched, fg_mask, n_fg = jax.vmap(compact_fg)(
                sb, sc, sm, sfg
            )
            pooled_m = self._pool(feats, fg_boxes, 14, pack=True)
            mlogits = self.mask_head(
                self._head_dtype(pooled_m.reshape(B * cap, *pooled_m.shape[2:]))
            ).astype(jnp.float32)
            mlogits = mlogits.reshape(B, cap, *mlogits.shape[1:])
            # GT masks live on a (mask_res, mask_res) canvas of the padded
            # image — per-axis scales (the canvas may be rectangular; the
            # mask grid is then anisotropic, data/loader.py:pack_batch)
            mres = gt_masks.shape[-1]
            sy = mres / images.shape[1]
            sx = mres / images.shape[2]
            scale = jnp.asarray([sx, sy, sx, sy], jnp.float32)
            m28 = jax.vmap(crop_gt_masks)(gt_masks, fg_matched, fg_boxes * scale)
            per_img = jax.vmap(mask_loss)(mlogits, fg_cls, m28, fg_mask)
            w = jnp.maximum(n_fg.astype(jnp.float32), 1.0)
            losses["loss_mask"] = jnp.sum(per_img * w) / jnp.sum(w)

        if source:
            nodes, labels, node_mask = self.graph_generator(
                self._feature_list(feats), gt_boxes, gt_classes.astype(jnp.int32),
                gt_valid,
            )
            losses["loss_matching"] = self.multi_matching_sup(
                nodes.astype(jnp.float32), labels, node_mask, self.U
            )
        return losses

    def loss_cross_domain(self, images_s, image_sizes_s, boxes_s, classes_s,
                          valid_s, images_t, image_sizes_t, boxes_t, classes_t,
                          valid_t, centers, completion_rng=None):
        """Cross-domain graph-matching branch for the mean-teacher step — the
        reference's intent at ``trainer.py:929``:
        ``graph_matching(None, (features_source, features_target),
        targets=(labeled, pseudo-labeled))`` with the SIGMA-style ``GModule``
        (``graph_matching.py:597-721``), never wired in the snapshot.

        Source nodes come from GT boxes on the labeled strong crops; target
        nodes from teacher pseudo-boxes on the unlabeled strong crops.  Each
        domain's per-image node sets are flattened into one node set (the
        reference GModule also aggregates nodes per domain across the batch).
        Returns ``(losses dict, new EMA class centers)``."""
        feats_s = self.extract_features(images_s)
        feats_t = self.extract_features(images_t)
        ns, ls, ms_ = self.graph_generator(
            self._feature_list(feats_s), boxes_s, classes_s.astype(jnp.int32),
            valid_s,
        )
        nt, lt, mt_ = self.graph_generator(
            self._feature_list(feats_t), boxes_t, classes_t.astype(jnp.int32),
            valid_t,
        )

        def flat(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        return self.cross_domain(
            flat(ns).astype(jnp.float32), flat(ls), flat(ms_),
            flat(nt).astype(jnp.float32), flat(lt), flat(mt_),
            centers, completion_rng=completion_rng,
        )

    def _dis_feature(self, images):
        """The ``dis_type`` feature map: an FPN level (``p2``..``p6``, the
        reference's live configs) or a raw backbone stage (``res2``..``res5``,
        the reference's *default* ``SEMISUPNET.DIS_TYPE="res4"`` — usable there
        only with C4 backbones; supported here for both)."""
        if self.dis_type.startswith("res"):
            return self.backbone(self._normalize(images))[self.dis_type]
        return self.extract_features(images)[self.dis_type]

    def loss_domain(self, images_source, images_target, image_sizes_s=None,
                    image_sizes_t=None):
        """``domain`` branch (reference ``rcnn.py:187-216``): gradient-reversed
        BCE patch discriminator on the ``dis_type`` feature level."""
        out_s = self.D_img(grad_reverse(self._dis_feature(images_source)))
        out_t = self.D_img(grad_reverse(self._dis_feature(images_target)))
        return {
            "loss_D_img_s": _bce_with_logits_mean(out_s.astype(jnp.float32), 0.0),
            "loss_D_img_t": _bce_with_logits_mean(out_t.astype(jnp.float32), 1.0),
        }

    # -- init helper ---------------------------------------------------------

    def __call__(self, images, image_sizes):
        """Init/trace path touching every submodule (cheap dummies for the
        graph modules and discriminator)."""
        out = self.forward_inference(images, image_sizes)
        _ = self.D_img(self._dis_feature(images))
        dummy_nodes = jnp.zeros((2, 4, self.fpn_channels))
        dummy_labels = jnp.ones((2, 4), jnp.int32)
        dummy_mask = jnp.ones((2, 4), bool)
        _ = self.multi_matching_sup(dummy_nodes, dummy_labels, dummy_mask, self.U)
        _ = self.multi_matching_unsup(dummy_nodes, dummy_labels, dummy_mask, self.U)
        # completion_rng given so the seed-projection params exist at init
        _ = self.cross_domain(
            dummy_nodes[0], dummy_labels[0], dummy_mask[0],
            dummy_nodes[1], dummy_labels[1], dummy_mask[1],
            completion_rng=jax.random.PRNGKey(0),
        )
        return out
