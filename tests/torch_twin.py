"""Pure-torch R50-FPN Mask R-CNN twin for whole-detector parity testing.

An independent execution of the reference detector's inference semantics
(reference ``adapteacher/modeling/meta_arch/rcnn.py:67-420`` = detectron2
``GeneralizedRCNN`` conventions) built directly on torch kernels, loading the
SAME d2-named state dict the converter consumes.  Used by
``test_detector_parity.py`` to check the composed JAX detector — backbone →
FPN → RPN → ROIAlign → box/mask heads — against torch numerics end to end
(VERDICT r2 missing #1).

Deliberate configuration notes (matching the JAX side's documented choices):

* ROIAlign uses a static ``sampling_ratio=2`` instead of d2's adaptive
  ``ratio=0`` (the repo's documented deviation, ``ops/roi_align.py:10-15``).
* NMS is the exact sequential greedy scan (what torchvision ``nms`` computes);
  the JAX side's fixpoint formulation must agree with it box-for-box.

No detectron2 / torchvision required — everything below is plain torch.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

SCALE_CLAMP = math.log(1000.0 / 16.0)
PIXEL_MEAN = (103.530, 116.280, 123.675)
ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)
BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


class _SD:
    """Name-prefixed view over a d2 state dict of numpy arrays."""

    def __init__(self, sd: dict):
        self.sd = {k: _t(v) for k, v in sd.items()}

    def conv(self, name, x, stride=1, padding=0):
        w = self.sd[name + ".weight"]
        b = self.sd.get(name + ".bias")
        return F.conv2d(x, w, b, stride=stride, padding=padding)

    def frozen_bn(self, name, x):
        # d2 FrozenBatchNorm2d: scale = w / sqrt(var + eps); bias = b - mean*scale
        w = self.sd[name + ".weight"]
        b = self.sd[name + ".bias"]
        mean = self.sd.get(name + ".running_mean", torch.zeros_like(w))
        var = self.sd.get(name + ".running_var", torch.ones_like(w))
        scale = w / torch.sqrt(var + 1e-5)
        shift = b - mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]

    def fc(self, name, x):
        return F.linear(x, self.sd[name + ".weight"], self.sd[name + ".bias"])


# ---------------------------------------------------------------------------
# backbone + FPN
# ---------------------------------------------------------------------------

def resnet50_forward(sd: _SD, x, stage_blocks=(3, 4, 6, 3)):
    """Caffe-style R50 (stride_in_1x1, FrozenBN).  x: (1, 3, H, W)."""
    bu = "backbone.bottom_up."
    x = sd.conv(bu + "stem.conv1", x, stride=2, padding=3)
    x = F.relu(sd.frozen_bn(bu + "stem.conv1.norm", x))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    outs = {}
    for stage_idx, n_blocks in enumerate(stage_blocks):
        name = f"res{stage_idx + 2}"
        for i in range(n_blocks):
            pre = f"{bu}{name}.{i}."
            stride = 2 if (i == 0 and stage_idx > 0) else 1
            out = sd.conv(pre + "conv1", x, stride=stride)
            out = F.relu(sd.frozen_bn(pre + "conv1.norm", out))
            out = sd.conv(pre + "conv2", out, padding=1)
            out = F.relu(sd.frozen_bn(pre + "conv2.norm", out))
            out = sd.conv(pre + "conv3", out)
            out = sd.frozen_bn(pre + "conv3.norm", out)
            if (pre + "shortcut.weight") in sd.sd:
                sc = sd.conv(pre + "shortcut", x, stride=stride)
                sc = sd.frozen_bn(pre + "shortcut.norm", sc)
            else:
                sc = x
            x = F.relu(out + sc)
        outs[name] = x
    return outs


def fpn_forward(sd: _SD, feats):
    laterals = [sd.conv(f"backbone.fpn_lateral{i}", feats[f"res{i}"])
                for i in range(2, 6)]
    merged = [None] * 4
    merged[3] = laterals[3]
    for i in (2, 1, 0):
        up = F.interpolate(merged[i + 1], scale_factor=2, mode="nearest")
        up = up[:, :, : laterals[i].shape[2], : laterals[i].shape[3]]
        merged[i] = laterals[i] + up
    outs = {
        f"p{i + 2}": sd.conv(f"backbone.fpn_output{i + 2}", merged[i], padding=1)
        for i in range(4)
    }
    outs["p6"] = F.max_pool2d(outs["p5"], 1, stride=2)
    return outs


# ---------------------------------------------------------------------------
# anchors / boxes / NMS
# ---------------------------------------------------------------------------

def cell_anchors(sizes, ratios):
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return torch.tensor(out, dtype=torch.float32)


def grid_anchors(feat_h, feat_w, stride, cell):
    sx = (torch.arange(feat_w, dtype=torch.float32)) * stride
    sy = (torch.arange(feat_h, dtype=torch.float32)) * stride
    sx = sx.repeat(feat_h)
    sy = sy.repeat_interleave(feat_w)
    shifts = torch.stack([sx, sy, sx, sy], dim=-1)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = torch.clamp(deltas[..., 2] / ww, max=SCALE_CLAMP)
    dh = torch.clamp(deltas[..., 3] / wh, max=SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = torch.exp(dw) * w
    ph = torch.exp(dh) * h
    return torch.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                        pcx + 0.5 * pw, pcy + 0.5 * ph], dim=-1)


def clip_boxes(boxes, h, w):
    return torch.stack([boxes[..., 0].clamp(0, w), boxes[..., 1].clamp(0, h),
                        boxes[..., 2].clamp(0, w), boxes[..., 3].clamp(0, h)],
                       dim=-1)


def pairwise_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]).clamp(min=0) * (b1[:, 3] - b1[:, 1]).clamp(min=0)
    a2 = (b2[:, 2] - b2[:, 0]).clamp(min=0) * (b2[:, 3] - b2[:, 1]).clamp(min=0)
    lt = torch.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = torch.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return torch.where(inter > 0, inter / union.clamp(min=1e-12),
                       torch.zeros_like(inter))


def nms(boxes, scores, iou_threshold):
    """Sequential greedy NMS (torchvision ``nms`` semantics).  Returns the
    kept indices sorted by descending score."""
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    iou = pairwise_iou(boxes, boxes)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True  # self, already kept
    return torch.tensor(keep, dtype=torch.long)


# ---------------------------------------------------------------------------
# ROIAlign (aligned=True, static sampling_ratio)
# ---------------------------------------------------------------------------

def _roi_align_grid(feat, b, P, ny, nx):
    """One subsample grid over rois ``b`` (K, 4) already scaled/offset;
    ``ny``/``nx`` subsamples per bin (shared across the K rois).  Returns
    (K, C, P, P)."""
    C, H, W = feat.shape
    K = b.shape[0]
    bw = (b[:, 2] - b[:, 0]) / P  # (K,) bin sizes
    bh = (b[:, 3] - b[:, 1]) / P
    # sample centers: bin i, subsample j -> start + (i + (j+0.5)/n) * bin
    ii = torch.arange(P, dtype=torch.float32)
    fy = (ii[:, None] + (torch.arange(ny, dtype=torch.float32)[None, :] + 0.5)
          / ny).reshape(-1)  # (P*ny,)
    fx = (ii[:, None] + (torch.arange(nx, dtype=torch.float32)[None, :] + 0.5)
          / nx).reshape(-1)
    ys = b[:, 1, None] + fy[None, :] * bh[:, None]  # (K, P*ny)
    xs = b[:, 0, None] + fx[None, :] * bw[:, None]  # (K, P*nx)
    valid = ((ys[:, :, None] > -1) & (ys[:, :, None] < H)
             & (xs[:, None, :] > -1) & (xs[:, None, :] < W))
    y = ys.clamp(0, H - 1)
    x = xs.clamp(0, W - 1)
    y0 = y.floor()
    x0 = x.floor()
    y1 = (y0 + 1).clamp(max=H - 1)
    x1 = (x0 + 1).clamp(max=W - 1)
    ly = y - y0
    lx = x - x0
    flat = feat.reshape(C, H * W)

    def g(yy, xx):  # (K, Py), (K, Px) -> (K, Py, Px, C)
        idx = (yy[:, :, None] * W + xx[:, None, :]).long().reshape(K, -1)
        return flat[:, idx].permute(1, 2, 0).reshape(K, yy.shape[1], xx.shape[1], C)

    wy0 = (1 - ly)[:, :, None, None]
    wy1 = ly[:, :, None, None]
    wx0 = (1 - lx)[:, None, :, None]
    wx1 = lx[:, None, :, None]
    v = (g(y0, x0) * wy0 * wx0 + g(y0, x1) * wy0 * wx1
         + g(y1, x0) * wy1 * wx0 + g(y1, x1) * wy1 * wx1)
    v = torch.where(valid[..., None], v, torch.zeros(()))
    # average ny x nx subsamples per bin -> (K, P, P, C) -> (K, C, P, P)
    v = v.reshape(K, P, ny, P, nx, C).mean(dim=(2, 4))
    return v.permute(0, 3, 1, 2).contiguous()


def roi_align(feat, rois, spatial_scale, output_size=7, sampling_ratio=2):
    """feat (C, H, W); rois (K, 4) xyxy image coords.  d2 ``aligned=True``:
    half-pixel shift, out-of-range samples ([-1, H] exclusive) contribute
    zero, in-range coords clamp to the border.

    ``sampling_ratio=0`` is d2/torchvision's ADAPTIVE grid — per roi and per
    axis ``ceil(bin_size)`` subsamples (torchvision roi_align kernel:
    ``roi_bin_grid_h = ceil(roi_height / pooled_height)``); the reference's
    poolers run with this default (d2 ``ROIPooler`` via
    ``adapteacher/modeling/roi_heads/roi_heads.py:39-44`` and
    ``torchvision.ops.roi_align`` at ``engine/trainer.py:83-98``)."""
    P = output_size
    b = rois * spatial_scale - 0.5
    if sampling_ratio > 0:
        return _roi_align_grid(feat, b, P, sampling_ratio, sampling_ratio)
    # adaptive: group rois by their (ny, nx) so each group vectorizes
    C = feat.shape[0]
    K = rois.shape[0]
    bh = ((b[:, 3] - b[:, 1]) / P).clamp(min=0)
    bw = ((b[:, 2] - b[:, 0]) / P).clamp(min=0)
    ny = torch.ceil(bh).long().clamp(min=1)
    nx = torch.ceil(bw).long().clamp(min=1)
    out = torch.zeros(K, C, P, P)
    for key in {(int(a), int(c)) for a, c in zip(ny, nx)}:
        sel = (ny == key[0]) & (nx == key[1])
        out[sel] = _roi_align_grid(feat, b[sel], P, key[0], key[1])
    return out


def assign_fpn_levels(rois, min_level=2, max_level=5):
    area = ((rois[:, 2] - rois[:, 0]).clamp(min=0)
            * (rois[:, 3] - rois[:, 1]).clamp(min=0))
    lvl = torch.floor(4 + torch.log2(torch.sqrt(area) / 224.0 + 1e-8))
    return lvl.clamp(min_level, max_level).long()


def multilevel_roi_align(feats, rois, output_size=7, sampling_ratio=2):
    """feats: {p2..p5} NCHW (batch 1); rois (K, 4)."""
    levels = assign_fpn_levels(rois)
    K = rois.shape[0]
    C = feats["p2"].shape[1]
    out = torch.zeros(K, C, output_size, output_size)
    for lvl, stride in zip(range(2, 6), (4, 8, 16, 32)):
        sel = levels == lvl
        if sel.any():
            out[sel] = roi_align(feats[f"p{lvl}"][0], rois[sel], 1.0 / stride,
                                 output_size=output_size,
                                 sampling_ratio=sampling_ratio)
    return out


# ---------------------------------------------------------------------------
# the detector
# ---------------------------------------------------------------------------

class TorchTwin:
    """Inference-path twin of ``models.rcnn.MaskRCNN`` on torch kernels."""

    def __init__(self, sd: dict, *, num_classes=2, pre_nms_topk=1000,
                 post_nms_topk=1000, rpn_nms_thresh=0.7, score_thresh=0.05,
                 nms_thresh=0.5, detections_per_image=100,
                 stage_blocks=(3, 4, 6, 3), sampling_ratio=2):
        self.sd = _SD(sd)
        self.num_classes = num_classes
        self.pre_nms_topk = pre_nms_topk
        self.post_nms_topk = post_nms_topk
        self.rpn_nms_thresh = rpn_nms_thresh
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.detections_per_image = detections_per_image
        self.stage_blocks = stage_blocks
        # 2 = the repo's documented static deviation (ops/roi_align.py:10-15);
        # 0 = d2's true adaptive grid (what the reference actually computes)
        self.sampling_ratio = sampling_ratio

    def features(self, image):
        """image: (1, 3, H, W) RGB float 0-255 (padded)."""
        mean = torch.tensor(PIXEL_MEAN).reshape(1, 3, 1, 1)
        res = resnet50_forward(self.sd, image - mean, self.stage_blocks)
        return res, fpn_forward(self.sd, res)

    def rpn_outputs(self, fpn):
        logits, deltas = [], []
        for lvl in range(2, 7):
            t = F.relu(self.sd.conv("proposal_generator.rpn_head.conv",
                                    fpn[f"p{lvl}"], padding=1))
            logits.append(self.sd.conv(
                "proposal_generator.rpn_head.objectness_logits", t))
            deltas.append(self.sd.conv(
                "proposal_generator.rpn_head.anchor_deltas", t))
        return logits, deltas

    def proposals(self, fpn, image_size):
        """d2 ``find_top_rpn_proposals``: per-level top-k -> decode -> clip ->
        per-level NMS -> merge by score, keep post_nms_topk."""
        logits, deltas = self.rpn_outputs(fpn)
        h, w = image_size
        all_boxes, all_scores = [], []
        for lvl, lgt, dlt in zip(range(2, 7), logits, deltas):
            A = lgt.shape[1]
            Hf, Wf = lgt.shape[2:]
            cell = cell_anchors(ANCHOR_SIZES[lvl - 2], ANCHOR_RATIOS)
            anc = grid_anchors(Hf, Wf, FPN_STRIDES[lvl - 2], cell)
            # NHWC-flatten to match anchor order (h-major, then w, then a)
            scores = lgt[0].permute(1, 2, 0).reshape(-1)
            dl = dlt[0].permute(1, 2, 0).reshape(-1, 4)
            k = min(self.pre_nms_topk, scores.shape[0])
            top_s, idx = scores.topk(k)
            boxes = clip_boxes(decode_boxes(dl[idx], anc[idx]), h, w)
            ok = ((boxes[:, 2] - boxes[:, 0]) > 0) & ((boxes[:, 3] - boxes[:, 1]) > 0)
            boxes, top_s = boxes[ok], top_s[ok]
            if len(boxes):
                keep = nms(boxes, top_s, self.rpn_nms_thresh)
                all_boxes.append(boxes[keep])
                all_scores.append(top_s[keep])
        boxes = torch.cat(all_boxes)
        scores = torch.cat(all_scores)
        k = min(self.post_nms_topk, len(scores))
        top_s, idx = scores.topk(k)
        return boxes[idx], top_s

    def box_head(self, pooled):
        x = pooled.flatten(1)  # NCHW flatten — the d2 layout
        x = F.relu(self.sd.fc("roi_heads.box_head.fc1", x))
        x = F.relu(self.sd.fc("roi_heads.box_head.fc2", x))
        scores = self.sd.fc("roi_heads.box_predictor.cls_score", x)
        deltas = self.sd.fc("roi_heads.box_predictor.bbox_pred", x)
        return scores, deltas

    def box_inference(self, fpn, prop_boxes, image_size):
        """d2 ``fast_rcnn_inference``: softmax, per-class decode + clip,
        score threshold, per-class NMS, top detections by score."""
        pooled = multilevel_roi_align(fpn, prop_boxes, 7,
                                      sampling_ratio=self.sampling_ratio)
        scores, deltas = self.box_head(pooled)
        probs = F.softmax(scores, dim=-1)[:, : self.num_classes]
        K = prop_boxes.shape[0]
        deltas = deltas.reshape(K, self.num_classes, 4)
        boxes = decode_boxes(
            deltas, prop_boxes[:, None, :].expand(K, self.num_classes, 4),
            BBOX_REG_WEIGHTS,
        )
        boxes = clip_boxes(boxes, image_size[0], image_size[1])
        out_b, out_s, out_c = [], [], []
        for c in range(self.num_classes):
            sel = probs[:, c] > self.score_thresh
            if not sel.any():
                continue
            b, s = boxes[sel, c], probs[sel, c]
            keep = nms(b, s, self.nms_thresh)
            out_b.append(b[keep])
            out_s.append(s[keep])
            out_c.append(torch.full((len(keep),), c, dtype=torch.long))
        if not out_b:
            return (torch.zeros(0, 4), torch.zeros(0), torch.zeros(0, dtype=torch.long))
        b = torch.cat(out_b)
        s = torch.cat(out_s)
        c = torch.cat(out_c)
        k = min(self.detections_per_image, len(s))
        top_s, idx = s.topk(k)
        return b[idx], top_s, c[idx]

    def mask_probs(self, fpn, boxes, classes):
        x = multilevel_roi_align(fpn, boxes, 14,
                                 sampling_ratio=self.sampling_ratio)
        for i in range(1, 5):
            x = F.relu(self.sd.conv(f"roi_heads.mask_head.mask_fcn{i}", x,
                                    padding=1))
        x = F.relu(F.conv_transpose2d(
            x, self.sd.sd["roi_heads.mask_head.deconv.weight"],
            self.sd.sd["roi_heads.mask_head.deconv.bias"], stride=2))
        logits = self.sd.conv("roi_heads.mask_head.predictor", x)  # (K, C, 28, 28)
        sel = logits[torch.arange(len(classes)), classes]
        return torch.sigmoid(sel)

    @torch.no_grad()
    def forward_inference(self, image, image_size):
        _, fpn = self.features(image)
        prop_boxes, prop_scores = self.proposals(fpn, image_size)
        boxes, scores, classes = self.box_inference(fpn, prop_boxes, image_size)
        masks = self.mask_probs(fpn, boxes, classes) if len(boxes) else \
            torch.zeros(0, 28, 28)
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "mask_probs": masks,
                "proposal_boxes": prop_boxes, "proposal_scores": prop_scores}
