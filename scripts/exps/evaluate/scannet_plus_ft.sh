#!/bin/bash
# Evaluate a per-scene fine-tuned method on a ScanNet_plus scene
# (reference scripts/exps/evaluate/scannet_plus_ft.sh).
# Usage: bash scripts/exps/evaluate/scannet_plus_ft.sh [method] [scene]
METHOD="${1:-enerf_ours}"
SCENE="$2"

SCANNET_SCENES=('scene0000_01' 'scene0079_00' 'scene0158_00' 'scene0316_00' 'scene0521_00' 'scene0553_00' 'scene0616_00' 'scene0653_00')

if [[ " ${SCANNET_SCENES[*]} " =~ [[:space:]]${SCENE}[[:space:]] ]]; then
    python run.py --type evaluate --cfg_file "configs/exps/finetune/${METHOD}/scannet_plus/${SCENE}.yaml"
else
    echo "Invalid scene name. Please choose from: ${SCANNET_SCENES[@]}"
    exit 1
fi
