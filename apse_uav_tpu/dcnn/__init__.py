"""DCNN method: Mask R-CNN vehicle detector + embedding multi-object tracker.

TPU-native re-design of the reference's detectron2-based ``dcnn/`` tree
(SURVEY.md §2): fixed-capacity tensors + validity masks instead of dynamic
Instances, XLA-friendly NMS / ROIAlign / Hungarian instead of CUDA ops, and a
``lax.scan``-able tracker state instead of a mutable Python track store.
"""
