"""ATeacherTrainer eval dispatch: the reference's eval-only MT path
(``test_segment_MT.yaml``) evaluates the EMA teacher by default and the
student under ``TEST.EVAL_STU`` (reference ``train_net.py:53-56``), and the
trainer factory dispatches on ``SEMISUPNET.Trainer``
(reference ``train_net.py:39-44``)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ttdg_mgm_tpu.data.catalog import DatasetCatalog
from ttdg_mgm_tpu.data.coco import register_coco_instances
from ttdg_mgm_tpu.engine.mean_teacher import ATeacherTrainer
from ttdg_mgm_tpu.models import MaskRCNN
from ttdg_mgm_tpu.solver.build import build_optimizer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mt_eval_ds")
    img_dir = root / "images"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(2):
        arr = np.full((64, 64, 3), 30, np.uint8)
        cx, cy, r = 26 + 6 * i, 30, 10
        yy, xx = np.mgrid[:64, :64]
        arr[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = [200, 180, 160]
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
        images.append({"id": i, "file_name": f"im{i}.png", "height": 64,
                       "width": 64})
        theta = np.linspace(0, 2 * np.pi, 13)[:-1]
        poly = np.stack([cx + r * np.cos(theta), cy + r * np.sin(theta)], -1)
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [cx - r, cy - r, 2 * r, 2 * r], "iscrowd": 0,
            "area": float(np.pi * r * r),
            "segmentation": [poly.reshape(-1).tolist()],
        })
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "disc"}]}
    p = root / "eval.json"
    p.write_text(json.dumps(coco))
    name = "_mt_eval_fixture_ds"
    DatasetCatalog.remove(name)
    register_coco_instances(name, str(p), str(img_dir))
    return name


def test_build_trainer_dispatch(tmp_path):
    """SEMISUPNET.Trainer selects the trainer class (reference
    ``train_net.py:39-44``) and GRAPH/RESNETS knobs reach the model."""
    from ttdg_mgm_tpu.build import build_trainer
    from ttdg_mgm_tpu.config import get_cfg
    from ttdg_mgm_tpu.engine.trainer import BaselineTrainer

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 14
    cfg.MODEL.GRAPH.UNIV_SIZE = 8
    cfg.MODEL.GRAPH.GAGM_ITERS = 10
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.SEMISUPNET.Trainer = "ateacher"
    cfg.SEMISUPNET.DIS_TYPE = "p2"
    t = build_trainer(cfg)
    assert isinstance(t, ATeacherTrainer)
    assert t.model.resnet_depth == 14 and t.model.gagm_iters == 10

    cfg.SEMISUPNET.Trainer = "baseline"
    t2 = build_trainer(cfg)
    assert isinstance(t2, BaselineTrainer)
    assert not isinstance(t2, ATeacherTrainer)


class TestTeacherStudentEval:
    def test_eval_teacher_vs_student(self, dataset):
        """Default eval adapts + evaluates the TEACHER copy (student params
        untouched); ``eval_student=True`` adapts the student."""
        model = MaskRCNN(
            num_classes=2, univ_size=8, node_cap_per_level=4,
            pre_nms_topk_train=32, pre_nms_topk_test=32, post_nms_topk=16,
            detections_per_image=4, batch_size_per_image=16, mask_fg_cap=4,
            pixel_mean=(103.5, 116.3, 123.7), pixel_std=(57.4, 57.1, 58.4),
            resnet_depth=14, gagm_iters=20, hippi_iters=10,
        )
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                            jnp.asarray([[64.0, 64.0]]))["params"]
        tx = build_optimizer(params, lambda _: 1.0)
        trainer = ATeacherTrainer(model, tx, params, canvas=64, min_size=64,
                                  max_size=64, gt_cap=4, mask_res=32)

        leaf = lambda p: np.array(p["backbone"]["res4_0"]["conv1"]["kernel"])
        student_before = leaf(trainer.state.params)

        results = trainer.test([dataset], ttt=True, tta_batch=2,
                               min_batch_num=1, dice_threshold=0.0)
        assert dataset in results
        for v in results[dataset].values():
            assert np.isfinite(v) or np.isnan(v)
        # teacher eval must not touch the student
        np.testing.assert_array_equal(leaf(trainer.state.params), student_before)
        teacher_after = leaf(trainer.teacher_params)
        teacher_moved = np.abs(teacher_after - student_before).max() > 0

        # student eval (TEST.EVAL_STU) adapts the student itself
        res2 = trainer.test([dataset], ttt=True, tta_batch=2, min_batch_num=1,
                            eval_student=True, dice_threshold=0.0)
        assert dataset in res2
        student_moved = (
            np.abs(leaf(trainer.state.params) - student_before).max() > 0
        )
        # with a random-init detector the matching loss can be exactly zero
        # (no interior FCOS-positive nodes); movement is required only when
        # the recorded TTA loss was nonzero
        if float(trainer.last_tta_loss) != 0.0:
            assert teacher_moved or student_moved
