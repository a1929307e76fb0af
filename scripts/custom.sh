#!/bin/bash
# Render a custom LLFF-style capture (COLMAP -> poses_bounds.npy expected).
python run.py --type visualize --cfg_file configs/custom/custom.yaml "$@"
