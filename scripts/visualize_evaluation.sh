#!/usr/bin/env bash
# Render MOTS tracking results over frames + assemble mp4s
# (reference visualize_evaluation.sh equivalent).
#   ./scripts/visualize_evaluation.sh <tracks_dir> <images_root> <out_dir> <seqmap>
set -euo pipefail
python -m apse_uav_tpu.cli.mots_vis "$1" "$2" "$3" "$4" --mp4
