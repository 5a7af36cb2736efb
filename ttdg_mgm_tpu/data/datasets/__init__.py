from ttdg_mgm_tpu.data.datasets.cityscapes_foggy import (
    load_cityscapes_foggy_instances,
    register_all_cityscapes_foggy,
)
from ttdg_mgm_tpu.data.datasets.fetus import FetusDataset, load_fetus_dicts

__all__ = [
    "load_cityscapes_foggy_instances",
    "register_all_cityscapes_foggy",
    "FetusDataset",
    "load_fetus_dicts",
]
