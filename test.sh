#!/usr/bin/env bash
# Checkpoint eval sweep (capability of reference test.sh:1-23): loop converted
# checkpoints through eval-only TTA; results append to OUTPUT_DIR/result_ap.txt.
set -euo pipefail

CONFIG=${CONFIG:-configs/test_segment.yaml}
CKPT_DIR=${CKPT_DIR:-output/checkpoints}
DATASETS_ROOT=${TTDG_DATASETS:-datasets}

for ckpt in "${CKPT_DIR}"/model_*.pth "${CKPT_DIR}"/model_*.pkl; do
  [ -e "$ckpt" ] || continue
  echo "=== evaluating ${ckpt}"
  python train_net.py --eval-only --config "${CONFIG}" \
    --datasets-root "${DATASETS_ROOT}" MODEL.WEIGHTS "${ckpt}"
done
