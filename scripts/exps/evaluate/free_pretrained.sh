#!/bin/bash
# Evaluate a pretrained method on the Free dataset.
# Usage: bash scripts/exps/evaluate/free_pretrained.sh [enerf|enerf_ours|mvsnerf|mvsnerf_ours]
METHOD=${1:-enerf_ours}
python run.py --type evaluate --cfg_file configs/exps/evaluate/${METHOD}/free_eval.yaml
