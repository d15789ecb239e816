"""Host-side data pipelines feeding fixed-shape device batches.

Equivalents of the reference's dataset utilities (SURVEY.md §2: U1-U5):
dataset-dict generators for UAVDT / VisDrone / COCO / COWC, detection
loaders with the reference's augmentation set, and MOT / KITTI-MOTS loaders
for association-head training.
"""

from apse_uav_tpu.data.datasets import (  # noqa: F401
    COCO_CATEGORY_IDS_TO_UAV,
    VISDRONE_CATEGORY_IDS_TO_UAV,
    fabricate_outputs,
    generate_coco_dataset_dictionaries,
    generate_cowc_dataset_dictionaries,
    generate_uav_dataset_dictionaries,
    generate_visdrone_dataset_dictionaries,
)
from apse_uav_tpu.data.loader import DetectionLoader, pad_gt  # noqa: F401
