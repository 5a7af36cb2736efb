"""Data layer: dataset catalog, COCO parsing, augmentation, static batching.

Capability of reference ``adapteacher/data/`` (SURVEY.md section 2.1 rows
26-33): dataset registration side-effects, supervised/two-crop loaders, weak
and strong augmentation, TTT test batching (``TEST.BATCH`` when adapting,
else 1).  All image decoding/augmentation runs on host (NumPy/PIL/cv2); the
device receives fixed-shape padded batches.
"""

from ttdg_mgm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from ttdg_mgm_tpu.data.coco import load_coco_json
from ttdg_mgm_tpu.data.builtin import register_all_medical
from ttdg_mgm_tpu.data.loader import (
    build_test_loader,
    build_train_loader,
    pack_batch,
)
