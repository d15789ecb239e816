"""ArUco marker detection re-derived as fixed-shape vectorized XLA ops.

Replaces cv2.aruco.detectMarkers + estimatePoseSingleMarkers (reference
aruco_detect.py:261-269,601) with a TPU-native pipeline: dense candidate
proposal (integral-image blob scores), per-candidate quad extraction and
subpixel line-fit corner refinement, perspective bit sampling, DICT_4X4_50
decoding with error correction, and planar PnP pose.
"""

from apse_uav_tpu.aruco.dictionary import DICT_4X4_50, match_dictionary

__all__ = [
    "DICT_4X4_50",
    "match_dictionary",
]
