#!/bin/bash
# Evaluate a per-scene fine-tuned method on a Free scene
# (reference scripts/exps/evaluate/free_ft.sh).
# Usage: bash scripts/exps/evaluate/free_ft.sh [method] [scene]
METHOD="${1:-enerf_ours}"
SCENE="$2"

FREE_SCENES=('grass' 'hydrant' 'lab' 'pillar' 'road' 'sky' 'stair')

if [[ " ${FREE_SCENES[*]} " =~ [[:space:]]${SCENE}[[:space:]] ]]; then
    python run.py --type evaluate --cfg_file "configs/exps/finetune/${METHOD}/free/${SCENE}.yaml"
else
    echo "Invalid scene name. Please choose from: ${FREE_SCENES[@]}"
    exit 1
fi
