"""PyTorch/Detectron2 -> JAX weight conversion.

Capability of reference ``DetectionTSCheckpointer``
(``adapteacher/checkpoint/detection_checkpoint.py:10-93``) plus the
PyTorch->JAX converter SURVEY.md section 5.4 requires for Dice parity with
the released ``.pth`` models: maps the d2 state_dict names of
``DAobjTwoStagePseudoLabGeneralizedRCNN`` onto the Flax param tree of
``models.rcnn.MaskRCNN``.

Layout conversions:

* Conv2d ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)``
* Linear ``(O, I)`` -> ``(I, O)``
* box-head fc1 input reordering: torch flattens NCHW ``(C, 7, 7)``,
  our head flattens NHWC ``(7, 7, C)``
* ConvTranspose2d ``(I, O, kh, kw)`` -> ``(kh, kw, I, O)``, spatially
  flipped (flax ``ConvTranspose`` correlates, torch transposed-conv flips)
* FrozenBatchNorm ``(weight, bias, running_mean, running_var)`` folded to
  ``scale = w / sqrt(var + eps)``, ``bias = b - mean * scale``
* teacher/student ensembles: ``modelStudent.``/``modelTeacher.`` prefixes
  select which member to convert (reference loads the student for
  Caffe2-style checkpoints, the whole ensemble otherwise).
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    return np.transpose(w, (1, 0))


def _deconv(w):
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _fold_bn(sd, prefix):
    w = sd[prefix + ".weight"]
    b = sd[prefix + ".bias"]
    mean = sd.get(prefix + ".running_mean", np.zeros_like(w))
    var = sd.get(prefix + ".running_var", np.ones_like(w))
    scale = w / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _conv_block(sd, prefix):
    return {"kernel": _conv(sd[prefix + ".weight"])} | (
        {"bias": sd[prefix + ".bias"]} if prefix + ".bias" in sd else {}
    )


def _dense_block(sd, prefix, *, bias=True):
    out = {"kernel": _dense(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _mha_block(sd, prefix):
    return {
        "linear_q": _dense_block(sd, prefix + ".linear_q"),
        "linear_k": _dense_block(sd, prefix + ".linear_k"),
        "linear_v": _dense_block(sd, prefix + ".linear_v"),
        "linear_final": _dense_block(sd, prefix + ".linear_final"),
        "layer_norm": {
            "scale": sd[prefix + ".layer_norm.weight"],
            "bias": sd[prefix + ".layer_norm.bias"],
        },
    }


def _affinity_block(sd, prefix):
    """Reference Affinity: project_sr/tg + fc_M Sequential(Linear, ReLU,
    Linear); fc_M.0 is split into its X/Y halves (see graph.affinity)."""
    w0 = sd[prefix + ".fc_M.0.weight"]  # (512, 512) acting on [X(256); Y(256)]
    b0 = sd[prefix + ".fc_M.0.bias"]
    d = w0.shape[1] // 2
    return {
        "project_sr": {"kernel": _dense(sd[prefix + ".project_sr.weight"])},
        "project_tg": {"kernel": _dense(sd[prefix + ".project_tg.weight"])},
        "fc0_x": {"kernel": _dense(w0[:, :d]), "bias": b0},
        "fc0_y": {"kernel": _dense(w0[:, d:])},
        "fc1": _dense_block(sd, prefix + ".fc_M.2"),
    }


_C2_BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
              "branch1": "shortcut"}


def c2_resnet_to_d2_names(sd: dict) -> dict:
    """Translate Caffe2 MSRA ImageNet ResNet names (the ``R-50.pkl`` the
    reference initializes from, ``detectron2://ImageNetPretrained/MSRA``)
    into d2 backbone names (the d2 ``align_and_update_state_dicts``
    capability, reference ``detection_checkpoint.py:11-38``).

    Caffe2 BN is pre-folded affine (``*_bn_s``/``*_bn_b``, no running
    stats); ``_fold_bn`` defaults mean=0/var=1, so folding is a no-op.
    """
    import re

    out = {}
    for k, v in sd.items():
        if k in ("conv1_w",):
            out["backbone.bottom_up.stem.conv1.weight"] = v
        elif k == "res_conv1_bn_s":
            out["backbone.bottom_up.stem.conv1.norm.weight"] = v
        elif k == "res_conv1_bn_b":
            out["backbone.bottom_up.stem.conv1.norm.bias"] = v
        else:
            m = re.match(r"res(\d)_(\d+)_(branch\w+)_(w|bn_s|bn_b)$", k)
            if not m:
                continue  # fc1000 etc.
            stage, block, branch, kind = m.groups()
            conv = _C2_BRANCH.get(branch)
            if conv is None:
                continue
            base = f"backbone.bottom_up.res{stage}.{block}.{conv}"
            if kind == "w":
                out[base + ".weight"] = v
            elif kind == "bn_s":
                out[base + ".norm.weight"] = v
            else:
                out[base + ".norm.bias"] = v
    return out


def convert_d2_state_dict(sd: dict, *, num_classes: int = 2,
                          box_head_channels: int = 256,
                          member: str | None = None) -> dict:
    """Convert a d2/reference state_dict (numpy arrays) to the Flax params
    tree of ``MaskRCNN``.  ``member`` selects ``modelStudent``/``modelTeacher``
    when the checkpoint holds an ``EnsembleTSModel``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if member is not None:
        pre = member + "."
        sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}

    if "conv1_w" in sd:  # Caffe2 ImageNet pickle (backbone-only init)
        sd = c2_resnet_to_d2_names(sd)

    p: dict = {}

    # ---- backbone (d2 names: backbone.bottom_up.stem / res{2-5}.{i}) ------
    bu = "backbone.bottom_up."
    if bu + "stem.conv1.weight" not in sd and "backbone.stem.conv1.weight" in sd:
        bu = "backbone."  # plain-resnet naming
    if bu + "stem.conv1.weight" in sd:
        bb: dict = {}
        bb["stem_conv1"] = {"kernel": _conv(sd[bu + "stem.conv1.weight"])}
        bb["stem_conv1_norm"] = _fold_bn(sd, bu + "stem.conv1.norm")
        blocks = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
        for stage, n in blocks.items():
            for i in range(n):
                pre = f"{bu}{stage}.{i}."
                blk = {}
                for c in ("conv1", "conv2", "conv3"):
                    blk[c] = {"kernel": _conv(sd[pre + c + ".weight"])}
                    blk[c + "_norm"] = _fold_bn(sd, pre + c + ".norm")
                if pre + "shortcut.weight" in sd:
                    blk["shortcut"] = {"kernel": _conv(sd[pre + "shortcut.weight"])}
                    blk["shortcut_norm"] = _fold_bn(sd, pre + "shortcut.norm")
                bb[f"{stage}_{i}"] = blk
        p["backbone"] = bb

    # ---- FPN ---------------------------------------------------------------
    if "backbone.fpn_lateral2.weight" in sd:
        fpn = {}
        for i in range(2, 6):
            fpn[f"lateral{i}"] = _conv_block(sd, f"backbone.fpn_lateral{i}")
            fpn[f"output{i}"] = _conv_block(sd, f"backbone.fpn_output{i}")
        p["fpn"] = fpn

    # ---- RPN ---------------------------------------------------------------
    rh = "proposal_generator.rpn_head."
    if rh + "conv.weight" in sd:
        p["rpn_head"] = {
            "conv": _conv_block(sd, rh + "conv"),
            "objectness_logits": _conv_block(sd, rh + "objectness_logits"),
            "anchor_deltas": _conv_block(sd, rh + "anchor_deltas"),
        }

    # ---- box head (fc1 needs NCHW->NHWC input reordering) ------------------
    if "roi_heads.box_head.fc1.weight" in sd:
        C = box_head_channels
        w1 = sd["roi_heads.box_head.fc1.weight"]  # (1024, C*49)
        w1 = w1.reshape(-1, C, 7, 7).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
        p["box_head"] = {
            "fc1": {"kernel": _dense(w1),
                    "bias": sd["roi_heads.box_head.fc1.bias"]},
            "fc2": _dense_block(sd, "roi_heads.box_head.fc2"),
        }
        p["box_predictor"] = {
            "cls_score": _dense_block(sd, "roi_heads.box_predictor.cls_score"),
            "bbox_pred": _dense_block(sd, "roi_heads.box_predictor.bbox_pred"),
        }

    # ---- mask head ---------------------------------------------------------
    mh = "roi_heads.mask_head."
    if mh + "mask_fcn1.weight" in sd:
        mask = {}
        for i in range(1, 5):
            mask[f"mask_fcn{i}"] = _conv_block(sd, mh + f"mask_fcn{i}")
        mask["deconv"] = {
            "kernel": _deconv(sd[mh + "deconv.weight"]),
            "bias": sd[mh + "deconv.bias"],
        }
        mask["predictor"] = _conv_block(sd, mh + "predictor")
        p["mask_head"] = mask

    # ---- discriminator -----------------------------------------------------
    if "D_img.conv1.weight" in sd:
        p["D_img"] = {
            "conv1": _conv_block(sd, "D_img.conv1"),
            "conv2": _conv_block(sd, "D_img.conv2"),
            "classifier": _conv_block(sd, "D_img.classifier"),
        }

    # ---- graph matching modules -------------------------------------------
    if "multi_matching_sup.U" in sd:
        p["U"] = sd["multi_matching_sup.U"]
        p["multi_matching_sup"] = {
            "Net_U": {"g_gene": _mha_block(sd, "multi_matching_sup.Net_U.g_gene")}
        }
    if "multi_matching_unsup.node_affinity.project_sr.weight" in sd:
        p["multi_matching_unsup"] = {
            "node_affinity": _affinity_block(sd, "multi_matching_unsup.node_affinity"),
            "intra_domain_graph": _mha_block(sd, "multi_matching_unsup.intra_domain_graph"),
        }
    return p


def _inv_conv(k):
    return np.transpose(k, (3, 2, 0, 1))


def _inv_dense(k):
    return np.transpose(k, (1, 0))


def _inv_deconv(k):
    # forward: torch (I, O, kh, kw) -> transpose(2,3,0,1) -> spatial flip
    return np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)).copy()


def _inv_bn(blk, prefix, out):
    """Emit a FrozenBatchNorm quadruple that ``_fold_bn`` round-trips exactly:
    mean=0 and var=1-eps make ``w / sqrt(var + eps) == w``."""
    scale = np.asarray(blk["scale"])
    out[prefix + ".weight"] = scale
    out[prefix + ".bias"] = np.asarray(blk["bias"])
    out[prefix + ".running_mean"] = np.zeros_like(scale)
    out[prefix + ".running_var"] = np.full_like(scale, 1.0 - BN_EPS)


def _inv_conv_block(blk, prefix, out):
    out[prefix + ".weight"] = _inv_conv(blk["kernel"])
    if "bias" in blk:
        out[prefix + ".bias"] = np.asarray(blk["bias"])


def _inv_dense_block(blk, prefix, out):
    out[prefix + ".weight"] = _inv_dense(blk["kernel"])
    if "bias" in blk:
        out[prefix + ".bias"] = np.asarray(blk["bias"])


def _inv_mha_block(blk, prefix, out):
    for n in ("linear_q", "linear_k", "linear_v", "linear_final"):
        _inv_dense_block(blk[n], f"{prefix}.{n}", out)
    out[prefix + ".layer_norm.weight"] = np.asarray(blk["layer_norm"]["scale"])
    out[prefix + ".layer_norm.bias"] = np.asarray(blk["layer_norm"]["bias"])


def flax_to_d2_state_dict(params: dict, *, box_head_channels: int = 256) -> dict:
    """Inverse of ``convert_d2_state_dict``: export the ``MaskRCNN`` Flax param
    tree as a d2/reference-named numpy state_dict (the layout
    ``DetectionTSCheckpointer`` consumes, reference
    ``detection_checkpoint.py:10-93``).  Round-trips exactly through
    ``convert_d2_state_dict``; lets users move checkpoints back to the
    reference stack and powers the same-weights torch-twin comparisons."""
    p = {k: v for k, v in params.items()}
    sd: dict = {}

    if "backbone" in p:
        bb = p["backbone"]
        bu = "backbone.bottom_up."
        _inv_conv_block(bb["stem_conv1"], bu + "stem.conv1", sd)
        _inv_bn(bb["stem_conv1_norm"], bu + "stem.conv1.norm", sd)
        for name, blk in bb.items():
            if not name.startswith("res"):
                continue
            stage, i = name.rsplit("_", 1)
            pre = f"{bu}{stage}.{i}."
            for c in ("conv1", "conv2", "conv3", "shortcut"):
                if c in blk:
                    _inv_conv_block(blk[c], pre + c, sd)
                    _inv_bn(blk[c + "_norm"], pre + c + ".norm", sd)

    if "fpn" in p:
        for i in range(2, 6):
            if f"lateral{i}" in p["fpn"]:
                _inv_conv_block(p["fpn"][f"lateral{i}"],
                                f"backbone.fpn_lateral{i}", sd)
                _inv_conv_block(p["fpn"][f"output{i}"],
                                f"backbone.fpn_output{i}", sd)

    if "rpn_head" in p:
        rh = "proposal_generator.rpn_head."
        for n in ("conv", "objectness_logits", "anchor_deltas"):
            _inv_conv_block(p["rpn_head"][n], rh + n, sd)

    if "box_head" in p:
        C = box_head_channels
        w1 = _inv_dense(p["box_head"]["fc1"]["kernel"])  # (1024, 7*7*C) NHWC
        w1 = w1.reshape(-1, 7, 7, C).transpose(0, 3, 1, 2).reshape(w1.shape[0], -1)
        sd["roi_heads.box_head.fc1.weight"] = w1
        sd["roi_heads.box_head.fc1.bias"] = np.asarray(p["box_head"]["fc1"]["bias"])
        _inv_dense_block(p["box_head"]["fc2"], "roi_heads.box_head.fc2", sd)
        _inv_dense_block(p["box_predictor"]["cls_score"],
                         "roi_heads.box_predictor.cls_score", sd)
        _inv_dense_block(p["box_predictor"]["bbox_pred"],
                         "roi_heads.box_predictor.bbox_pred", sd)

    if "mask_head" in p:
        mh = "roi_heads.mask_head."
        for i in range(1, 5):
            _inv_conv_block(p["mask_head"][f"mask_fcn{i}"], mh + f"mask_fcn{i}", sd)
        sd[mh + "deconv.weight"] = _inv_deconv(p["mask_head"]["deconv"]["kernel"])
        sd[mh + "deconv.bias"] = np.asarray(p["mask_head"]["deconv"]["bias"])
        _inv_conv_block(p["mask_head"]["predictor"], mh + "predictor", sd)

    if "D_img" in p:
        for n in ("conv1", "conv2", "classifier"):
            _inv_conv_block(p["D_img"][n], "D_img." + n, sd)

    if "U" in p:
        sd["multi_matching_sup.U"] = np.asarray(p["U"])
        _inv_mha_block(p["multi_matching_sup"]["Net_U"]["g_gene"],
                       "multi_matching_sup.Net_U.g_gene", sd)
    if "multi_matching_unsup" in p:
        _inv_mha_block(p["multi_matching_unsup"]["intra_domain_graph"],
                       "multi_matching_unsup.intra_domain_graph", sd)
        aff = p["multi_matching_unsup"]["node_affinity"]
        pre = "multi_matching_unsup.node_affinity"
        sd[pre + ".project_sr.weight"] = _inv_dense(aff["project_sr"]["kernel"])
        sd[pre + ".project_tg.weight"] = _inv_dense(aff["project_tg"]["kernel"])
        w0 = np.concatenate([_inv_dense(aff["fc0_x"]["kernel"]),
                             _inv_dense(aff["fc0_y"]["kernel"])], axis=1)
        sd[pre + ".fc_M.0.weight"] = w0
        sd[pre + ".fc_M.0.bias"] = np.asarray(aff["fc0_x"]["bias"])
        _inv_dense_block(aff["fc1"], pre + ".fc_M.2", sd)

    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


# torchvision vgg16_bn ``features`` indices of the 13 convs (BN follows at +1)
_VGG16BN_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]


def vgg16bn_to_flax(sd: dict, prefix: str = "features.") -> dict:
    """Convert torchvision ``vgg16_bn`` weights (the init the reference's VGG
    backbone loads from a local torchvision checkpoint,
    ``adapteacher/modeling/meta_arch/vgg.py:122-130``) to the param tree of
    ``models.vgg.VGG16Backbone``: conv kernels OIHW->HWIO, BatchNorm folded
    into the frozen-affine ``scale``/``bias`` form."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: dict = {}
    for i, idx in enumerate(_VGG16BN_CONV_IDX):
        out[f"conv{i}"] = _conv_block(sd, f"{prefix}{idx}")
        out[f"conv{i}_norm"] = _fold_bn(sd, f"{prefix}{idx + 1}")
    return out


def load_reference_checkpoint(path: str, *, num_classes: int = 2,
                              prefer: str = "modelTeacher") -> dict:
    """Load a reference ``.pth`` (or d2 ``.pkl``) checkpoint and convert.
    Ensemble checkpoints (``EnsembleTSModel``) use ``prefer`` (the reference
    evaluates the teacher unless ``TEST.EVAL_STU``)."""
    import pickle

    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    member = None
    if any(k.startswith("modelTeacher.") for k in sd):
        member = prefer
    return convert_d2_state_dict(sd, num_classes=num_classes, member=member)
