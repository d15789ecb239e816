#!/usr/bin/env bash
# MOTS evaluation pipeline (reference run_mots_evaluation.sh equivalent):
# tracker -> uint16 result PNGs -> metrics.
#   ./scripts/run_mots_evaluation.sh <weights> <kitti_root> <gt_folder> <seqmap> [results_dir]
set -euo pipefail
WEIGHTS=$1; KITTI_ROOT=$2; GT=$3; SEQMAP=$4; OUT=${5:-mots_results}
python -m apse_uav_tpu.cli.tracker_test --mots_evaluation "$SEQMAP" \
    --kitti_root "$KITTI_ROOT" --output_dir "$OUT" --weights "$WEIGHTS"
python -m apse_uav_tpu.cli.mots_eval "$OUT" "$GT" "$SEQMAP" | tee "$OUT/metrics.txt"
