#!/usr/bin/env bash
# Fetch detectron2 model-zoo checkpoints (reference get_*_pretrained.sh).
# The .pkl files load directly via apse_uav_tpu.dcnn.weights.load_torch_file.
set -euo pipefail
DEST=${1:-pretrained}
mkdir -p "$DEST"
R50_URL="https://dl.fbaipublicfiles.com/detectron2/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x/137849600/model_final_f10217.pkl"
R101_URL="https://dl.fbaipublicfiles.com/detectron2/COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x/138205316/model_final_a3ec72.pkl"
curl -L -o "$DEST/mask_rcnn_R_50_FPN_3x.pkl" "$R50_URL"
curl -L -o "$DEST/mask_rcnn_R_101_FPN_3x.pkl" "$R101_URL"
echo "checkpoints in $DEST/"
