"""Kill-and-resume: the trainer checkpoints its full state periodically and
a FRESH trainer resumes from the saved iteration with identical params
(reference resume semantics: ``resume_or_load`` + ``PeriodicCheckpointer``,
``adapteacher/engine/trainer.py:233-257,377-382``; forced resume at
``train_net.py:92``)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ttdg_mgm_tpu.checkpoint.save import Checkpointer
from ttdg_mgm_tpu.data.catalog import DatasetCatalog
from ttdg_mgm_tpu.data.coco import register_coco_instances
from ttdg_mgm_tpu.engine.trainer import BaselineTrainer
from ttdg_mgm_tpu.models import MaskRCNN
from ttdg_mgm_tpu.solver.build import build_optimizer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_ds")
    img_dir = root / "images"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(3):
        arr = np.full((64, 64, 3), 30, np.uint8)
        cx, cy, r = 24 + 4 * i, 28, 10
        yy, xx = np.mgrid[:64, :64]
        arr[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = [200, 180, 160]
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
        images.append({"id": i, "file_name": f"im{i}.png", "height": 64, "width": 64})
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
    p = root / "train.json"
    p.write_text(json.dumps(coco))
    name = "_resume_fixture_ds"
    DatasetCatalog.remove(name)
    register_coco_instances(name, str(p), str(img_dir))
    return name


def make_trainer(seed=0):
    model = MaskRCNN(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=32, pre_nms_topk_test=32, post_nms_topk=16,
        detections_per_image=4, batch_size_per_image=16, mask_fg_cap=4,
        pixel_mean=(103.5, 116.3, 123.7), pixel_std=(57.4, 57.1, 58.4),
        resnet_depth=14, gagm_iters=20, hippi_iters=10,
    )
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    tx = build_optimizer(params, lambda _: 1e-4)
    return BaselineTrainer(model, tx, params, canvas=64, min_size=64,
                           max_size=64, gt_cap=4, mask_res=32)


@pytest.mark.slow  # multi-compile subprocess-style e2e; the light
# resume-noop test keeps checkpoint/resume in the default run
def test_kill_and_resume(dataset, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")

    # phase 1: train 4 iters, checkpoint every 2, "crash" (drop the trainer)
    t1 = make_trainer(seed=0)
    ckpt = Checkpointer(ckpt_dir)
    hooks = t1.default_hooks(checkpointer=ckpt, checkpoint_period=2,
                             output_dir=str(tmp_path / "out"), log_every=2)
    t1.train([dataset], max_iter=4, batch_size=2, hooks=hooks)
    ckpt._mgr.wait_until_finished()
    assert ckpt.latest_step() == 4
    # full-state checkpoint: params AND optimizer state AND iteration
    saved_kernel = np.array(t1.state.params["box_head"]["fc1"]["kernel"])

    # writers were wired: metrics.json exists with iteration records
    lines = (tmp_path / "out" / "metrics.json").read_text().strip().splitlines()
    assert lines and "total_loss" in lines[-1]

    # phase 2: FRESH trainer (different init seed) resumes
    t2 = make_trainer(seed=7)
    ckpt2 = Checkpointer(ckpt_dir)
    resumed = t2.resume_or_load(ckpt2)
    assert resumed
    assert int(t2.state.step) == 4
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["box_head"]["fc1"]["kernel"]), saved_kernel
    )

    # training continues from the saved iteration to max_iter
    t2.train([dataset], max_iter=6, batch_size=2)
    assert int(t2.state.step) == 6


def test_resume_noop_without_checkpoint(dataset, tmp_path):
    t = make_trainer(seed=1)
    before = np.array(t.state.params["box_head"]["fc1"]["kernel"])
    assert not t.resume_or_load(Checkpointer(str(tmp_path / "empty")))
    np.testing.assert_array_equal(
        np.asarray(t.state.params["box_head"]["fc1"]["kernel"]), before
    )
