#!/bin/bash
# Per-scene fine-tuning on ScanNet_plus.
# Usage: bash scripts/exps/finetune/scannet_plus_ft.sh [enerf_ours|mvsnerf_ours] [scene]
METHOD=${1:-enerf_ours}
SCENE=${2:-scene0000_01}
python train.py --cfg_file configs/exps/finetune/${METHOD}/scannet_plus/base.yaml \
    scene ${SCENE} exp_name_tag ${SCENE}_ft
python run.py --type evaluate --cfg_file configs/exps/finetune/${METHOD}/scannet_plus/base.yaml \
    scene ${SCENE} exp_name_tag ${SCENE}_ft
