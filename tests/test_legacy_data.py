"""Tests for legacy-parity data components: mask point samplers
(reference ``adapteacher/data/node_sampling.py``), foggy-cityscapes loader
(``data/datasets/cityscapes_foggy.py``), fetus dataset
(``data/datasets/fetus_dataset.py``)."""

import json
import os

import numpy as np
import pytest

from ttdg_mgm_tpu.data.node_sampling import (
    boundary_points,
    sample_boundary,
    sample_centroid_ring,
    sample_grid,
    sample_polygon_instances,
)


def _disk_mask(h=64, w=64, cx=32, cy=32, r=20):
    ys, xs = np.mgrid[:h, :w]
    return ((xs - cx) ** 2 + (ys - cy) ** 2 <= r * r)


class TestNodeSampling:
    def test_boundary_points_on_circle(self):
        pts = boundary_points(_disk_mask())
        assert pts.shape[1] == 2 and len(pts) > 0
        d = np.hypot(pts[:, 0] - 32, pts[:, 1] - 32)
        assert np.all(np.abs(d - 20) < 2.5)

    def test_boundary_empty_mask(self):
        assert len(boundary_points(np.zeros((16, 16), bool))) == 0
        assert sample_boundary(np.zeros((16, 16), bool)) == []

    def test_sample_boundary_uniform_count_and_membership(self):
        mask = _disk_mask()
        pts = sample_boundary(mask, num_samples=12)
        assert len(pts) == 12
        for x, y in pts:
            assert 0 <= x < 64 and 0 <= y < 64

    def test_inward_offset_moves_points_inside(self):
        mask = _disk_mask()
        pts = sample_boundary(mask, num_samples=16, inward_offset=5)
        d = np.hypot(
            np.asarray([p[0] for p in pts]) - 32,
            np.asarray([p[1] for p in pts]) - 32,
        )
        # boundary radius 20 nudged ~5 inward
        assert np.all(d < 19)

    def test_sample_boundary_random(self):
        pts = sample_boundary(
            _disk_mask(), num_samples=8, uniform=False,
            rng=np.random.default_rng(0),
        )
        assert len(pts) == 8

    def test_grid_sampling_inside_only(self):
        mask = _disk_mask()
        pts = sample_grid(mask, grid_size=8)
        assert len(pts) > 0
        for x, y in pts:
            assert mask[y, x]
            assert x % 8 == 0 and y % 8 == 0

    def test_centroid_ring(self):
        mask = _disk_mask()
        pts = sample_centroid_ring(mask, num_samples=8, radius=10)
        assert len(pts) == 8  # ring of r=10 fully inside r=20 disk
        d = np.hypot(
            np.asarray([p[0] for p in pts]) - 32,
            np.asarray([p[1] for p in pts]) - 32,
        )
        assert np.all(d <= 12)  # int rounding of ring coords
        assert sample_centroid_ring(np.zeros((8, 8), bool)) == []

    def test_polygon_instances(self):
        # square polygon instance
        poly = [[10.0, 10.0, 50.0, 10.0, 50.0, 50.0, 10.0, 50.0]]
        boundary, centroid = sample_polygon_instances(
            [poly], 64, 64, num_boundary=6, num_centroid=4, centroid_radius=5
        )
        assert len(boundary) == 6
        assert len(centroid) == 4


class TestCityscapesFoggy:
    @pytest.fixture
    def tree(self, tmp_path):
        img_dir = tmp_path / "leftImg8bit_foggy" / "train"
        gt_dir = tmp_path / "gtFine" / "train"
        for city in ("aachen",):
            (img_dir / city).mkdir(parents=True)
            (gt_dir / city).mkdir(parents=True)
            for beta in ("0.02", "0.01"):
                (img_dir / city / f"{city}_000000_000019_leftImg8bit_foggy_beta_{beta}.png").touch()
            ann = {
                "imgHeight": 1024,
                "imgWidth": 2048,
                "objects": [
                    {"label": "car", "polygon": [[0, 0], [10, 0], [10, 10], [0, 10]]},
                    {"label": "cargroup", "polygon": [[20, 20], [30, 20], [30, 30]]},
                    {"label": "sky", "polygon": [[0, 0], [2048, 0], [2048, 100]]},
                    {"label": "person", "polygon": [[5, 5], [6, 5]]},  # degenerate
                ],
            }
            with open(gt_dir / city / f"{city}_000000_000019_gtFine_polygons.json", "w") as f:
                json.dump(ann, f)
        return str(img_dir), str(gt_dir)

    def test_load_all_betas(self, tree):
        from ttdg_mgm_tpu.data.datasets import load_cityscapes_foggy_instances

        img_dir, gt_dir = tree
        dicts = load_cityscapes_foggy_instances(img_dir, gt_dir, cache=False)
        assert len(dicts) == 2  # both fog betas of the one frame
        anns = dicts[0]["annotations"]
        # sky is not a thing class; 2-point person polygon dropped
        assert len(anns) == 2
        assert all(a["category_id"] == 2 for a in anns)  # car (contiguous id 2)
        assert anns[0]["bbox"] == [0.0, 0.0, 10.0, 10.0]
        assert dicts[0]["height"] == 1024 and dicts[0]["width"] == 2048

    def test_beta_filter_and_cache(self, tree):
        from ttdg_mgm_tpu.data.datasets import load_cityscapes_foggy_instances

        img_dir, gt_dir = tree
        dicts = load_cityscapes_foggy_instances(img_dir, gt_dir, beta="0.02")
        assert len(dicts) == 1
        # second call hits the JSON sidecar cache
        again = load_cityscapes_foggy_instances(img_dir, gt_dir, beta="0.02")
        assert again == dicts

    def test_missing_tree_raises(self, tmp_path):
        from ttdg_mgm_tpu.data.datasets import load_cityscapes_foggy_instances

        empty = tmp_path / "none"
        empty.mkdir()
        with pytest.raises((FileNotFoundError, OSError)):
            load_cityscapes_foggy_instances(str(empty), str(empty), cache=False)


class TestFetusDataset:
    @pytest.fixture
    def tree(self, tmp_path):
        from PIL import Image

        root = tmp_path / "fetus"
        hosp = root / "hospital_A"
        (hosp / "annotations").mkdir(parents=True)
        (hosp / "three_vessel_tracheal").mkdir()
        per_image = {}
        for i in range(10):
            name = f"img_{i}.png"
            Image.new("RGB", (32, 24)).save(hosp / "three_vessel_tracheal" / name)
            per_image[name] = {
                "bodyPart": "三血管气管切面",
                "annotations": [
                    {"name": "脊柱", "vertex": [[4, 5], [14, 15]]},
                    {"name": "气管", "vertex": [[20, 2], [28, 9]]},
                    {"name": "unknown-organ", "vertex": [[0, 0], [1, 1]]},
                ],
            }
        # one image with wrong bodyPart -> filtered
        name_bad = "img_bad.png"
        Image.new("RGB", (32, 24)).save(hosp / "three_vessel_tracheal" / name_bad)
        per_image[name_bad] = {"bodyPart": "四腔心切面", "annotations": []}
        with open(hosp / "annotations" / "three_vessel_tracheal_annotations.json", "w") as f:
            json.dump({"annotations": per_image}, f)
        return str(root)

    def test_split_sizes_and_determinism(self, tree):
        from ttdg_mgm_tpu.data.datasets import FetusDataset

        kw = dict(hospitals=["hospital_A"], slices=["three_vessel_tracheal"])
        train = FetusDataset(tree, operation="train", **kw)
        valid = FetusDataset(tree, operation="valid", **kw)
        test = FetusDataset(tree, operation="test", **kw)
        assert len(train.images) == 10  # bad-bodyPart image filtered
        assert len(train) == 7 and len(valid) == 1 and len(test) == 2
        assert set(train.used) | set(valid.used) | set(test.used) == set(train.images)
        # deterministic across constructions
        assert FetusDataset(tree, operation="train", **kw).used == train.used

    def test_getitem_contents(self, tree):
        from ttdg_mgm_tpu.data.datasets import FetusDataset

        ds = FetusDataset(
            tree, hospitals=["hospital_A"], slices=["three_vessel_tracheal"],
            operation="test",
        )
        rec = ds[0]
        assert rec["image"].shape == (24, 32, 3)
        assert rec["boxes"].shape == (2, 4)  # unknown organ dropped
        np.testing.assert_array_equal(rec["boxes"][0], [4, 5, 14, 15])
        assert rec["labels"].tolist() == [2, 4]  # 脊柱=2, 气管=4 in 3VT vocab

    def test_load_fetus_dicts_catalog_format(self, tree):
        from ttdg_mgm_tpu.data.datasets import load_fetus_dicts

        dicts = load_fetus_dicts(
            tree, ["hospital_A"], ["three_vessel_tracheal"], operation="test"
        )
        assert len(dicts) == 2
        ann = dicts[0]["annotations"][0]
        assert ann["bbox_mode"] == "xyxy"
        assert ann["category_id"] == 1  # 0-based


class TestCityscapesRegistration:
    def test_register_catalog_entries(self, tmp_path):
        from ttdg_mgm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
        from ttdg_mgm_tpu.data.datasets import register_all_cityscapes_foggy

        for n in list(DatasetCatalog.list()):
            if n.startswith("cityscapes_foggy"):
                DatasetCatalog.remove(n)
        register_all_cityscapes_foggy(root=str(tmp_path))
        assert "cityscapes_foggy_train" in DatasetCatalog.list()
        assert (
            MetadataCatalog.get("cityscapes_foggy_val")["thing_classes"][2] == "car"
        )
        for n in ("cityscapes_foggy_train", "cityscapes_foggy_val", "cityscapes_foggy_test"):
            DatasetCatalog.remove(n)


class TestLegacyRegistrations:
    def test_register_all_legacy(self, tmp_path):
        """Reference builtin.py:32-183 registrations exist and are lazy."""
        from ttdg_mgm_tpu.data.builtin import register_all_legacy
        from ttdg_mgm_tpu.data.catalog import DatasetCatalog, MetadataCatalog

        for n in ("coco_2017_unlabel", "coco_2017_for_voc20",
                  "cityscapes_foggy_train", "cityscapes_foggy_val",
                  "cityscapes_foggy_test", "Clipart1k_train",
                  "Clipart1k_test", "Watercolor_train", "Watercolor_test"):
            DatasetCatalog.remove(n)
        register_all_legacy(str(tmp_path))
        names = DatasetCatalog.list()
        assert "coco_2017_unlabel" in names
        assert "cityscapes_foggy_train" in names
        assert "Clipart1k_test" in names
        assert MetadataCatalog.get("Watercolor_test")["evaluator_type"] == (
            "pascal_voc_water")

    def test_coco_unlabel_loader(self, tmp_path):
        import json

        from ttdg_mgm_tpu.data.builtin import _load_images_only_json

        j = tmp_path / "info.json"
        j.write_text(json.dumps({"images": [
            {"id": 2, "file_name": "b.jpg", "height": 10, "width": 20},
            {"id": 1, "file_name": "a.jpg", "height": 30, "width": 40},
        ]}))
        recs = _load_images_only_json(str(j), str(tmp_path))
        assert [r["image_id"] for r in recs] == [1, 2]  # sorted, like d2
        assert recs[0]["annotations"] == []


class TestVocLoader:
    def test_load_and_register(self, tmp_path):
        import os

        from ttdg_mgm_tpu.data.datasets.pascal_voc import (
            load_voc_instances,
            register_pascal_voc,
        )

        d = tmp_path / "clipart"
        (d / "ImageSets" / "Main").mkdir(parents=True)
        (d / "Annotations").mkdir()
        (d / "JPEGImages").mkdir()
        (d / "ImageSets" / "Main" / "train.txt").write_text("img1\n")
        (d / "Annotations" / "img1.xml").write_text(
            """<annotation><size><width>100</width><height>80</height>
            <depth>3</depth></size>
            <object><name>dog</name><difficult>0</difficult>
            <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>50</xmax>
            <ymax>60</ymax></bndbox></object>
            <object><name>unknownthing</name>
            <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax>
            <ymax>5</ymax></bndbox></object>
            </annotation>"""
        )
        recs = load_voc_instances(str(d), "train")
        assert len(recs) == 1 and recs[0]["height"] == 80
        anns = recs[0]["annotations"]
        assert len(anns) == 1  # unknown class dropped
        assert anns[0]["bbox"] == [10.0, 20.0, 50.0, 60.0]  # 1-indexed -> 0
        assert anns[0]["category_id"] == 11  # 'dog' in VOC 20-class order

        from ttdg_mgm_tpu.data.catalog import DatasetCatalog

        DatasetCatalog.remove("_voc_fixture")
        register_pascal_voc("_voc_fixture", str(d), "train")
        assert len(DatasetCatalog.get("_voc_fixture")) == 1


class TestLegacyConfigs:
    def test_legacy_configs_parse(self):
        import os

        from ttdg_mgm_tpu.config import setup_cfg

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = setup_cfg(os.path.join(repo, "configs/test_detection.yaml"), [])
        assert cfg.MODEL.MASK_ON is False
        assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 7
        assert cfg.SOLVER.LR_SCHEDULER_NAME == "WarmupTwoStageMultiStepLR"
        cfg2 = setup_cfg(os.path.join(repo, "configs/Base-RCNN-C4.yaml"), [])
        assert cfg2.MODEL.RPN.PRE_NMS_TOPK_TEST == 6000
