#!/bin/bash
# Render a novel-view video of a user capture (reference scripts/custom.sh).
# Prepare the scene first — see docs/CUSTOM_CAPTURE.md.

python run.py --type visualize --cfg_file configs/custom/custom.yaml "$@"
