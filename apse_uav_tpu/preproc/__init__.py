"""Frame preprocessing: batched undistortion (remap) + gamma correction.

TPU-native replacement for the reference's per-frame OpenCV chain
(aruco_detect.py:250-259 and dcnn/scripts/tests/visualize_uav.py:56-71).
"""

from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor, build_remap_plan
from apse_uav_tpu.preproc.remap import (
    Preprocessor,
    bilinear_remap_u8,
    preprocess_frames,
)

__all__ = [
    "PallasPreprocessor",
    "Preprocessor",
    "bilinear_remap_u8",
    "build_remap_plan",
    "preprocess_frames",
]
