"""Device-side detection ops: box math, NMS, ROIAlign — all static-shape XLA."""

from apse_uav_tpu.dcnn.ops.boxes import (  # noqa: F401
    apply_deltas,
    box_area,
    box_iou,
    clip_boxes,
    get_deltas,
    nonempty,
)
from apse_uav_tpu.dcnn.ops.nms import batched_nms, nms_mask  # noqa: F401
from apse_uav_tpu.dcnn.ops.roi_align import roi_align, roi_pool  # noqa: F401
