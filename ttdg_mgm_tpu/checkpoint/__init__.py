"""Checkpointing: orbax save/restore + PyTorch/Detectron2 weight conversion."""

from ttdg_mgm_tpu.checkpoint.save import Checkpointer
from ttdg_mgm_tpu.checkpoint.converter import (
    convert_d2_state_dict,
    load_reference_checkpoint,
)
