#!/bin/bash
# Per-scene fine-tuning on Free scenes.
# Usage: bash scripts/exps/finetune/free_ft.sh [method] [scene ...]
METHOD=${1:-enerf_ours}
shift || true
SCENES=${@:-"grass hydrant lab pillar road sky stair"}
for SCENE in $SCENES; do
  python train.py --cfg_file configs/exps/finetune/${METHOD}/free/base.yaml \
    scene "$SCENE" exp_name_tag "${SCENE}_ft"
  python run.py --type evaluate --cfg_file configs/exps/finetune/${METHOD}/free/base.yaml \
    scene "$SCENE" exp_name_tag "${SCENE}_ft"
done
