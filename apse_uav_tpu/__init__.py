"""apse-uav-tpu: TPU-native UAV automotive-perception evaluation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``vision-agh/apse_uav`` (see SURVEY.md): batched 4K frame preprocessing
(undistort + gamma) as fused TPU kernels, an ArUco marker detector re-derived
as fixed-shape vectorized XLA ops, planar PnP pose + inter-vehicle distance
measurement, and a Mask R-CNN vehicle detector / multi-object tracker with a
triplet-loss re-ID association head — plus training, checkpoint surgery, and
COCO/MOTS evaluation tooling.

Subpackages
-----------
core        camera model, rotations, colorspace, fixed-capacity instances
preproc     undistort-map building and fused remap+gamma preprocessing
aruco       marker detection / decoding / pose / distances, temporal pipeline
dcnn        detection models, ops (NMS/ROIAlign), tracker, losses
data        host-side dataset pipelines (UAVDT / VisDrone / COCO / MOT(S))
evaluation  RLE codec, COCO-style detection eval, MOTS metrics
train       optimizers, training loops, orbax checkpointing, weight surgery
parallel    device-mesh / sharding helpers
utils       profiling, visualization, CSV and video I/O
cli         user-facing entry points (aruco_detect, tracking, training)
"""

__version__ = "0.1.0"
