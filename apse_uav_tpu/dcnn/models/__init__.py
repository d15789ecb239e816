"""Flax model zoo: ResNet-FPN backbone, RPN, ROI heads, Mask R-CNN, re-ID head."""

from apse_uav_tpu.dcnn.models.resnet import FPN, ResNet, ResNetFPN  # noqa: F401
from apse_uav_tpu.dcnn.models.association import AssociationHead  # noqa: F401
from apse_uav_tpu.dcnn.models.c4 import MaskRCNNC4, build_model  # noqa: F401
