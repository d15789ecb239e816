"""Evaluation stack: RLE mask codec, COCO-style detection AP, MOTS metrics."""

from apse_uav_tpu.evaluation import rle  # noqa: F401
