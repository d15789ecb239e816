"""Aerial-view detector smoke test (reference aerial_view_test.py:50-71).

The reference script runs a 3-class Faster R-CNN (car/truck/bus, no mask
head) fine-tuned on aerial imagery over ``./test_images`` and shows each
annotated frame.  This CLI is the headless equivalent: same 3-class no-mask
defaults, annotated copies written next to the inputs (detector_test with
aerial defaults).

Note: ``--no_mask`` is FORCED on by default to match the reference's aerial
regime (its model has no mask head).  To run with a mask head, pass
``--with_mask`` explicitly.

Usage:
    python -m apse_uav_tpu.cli.aerial_view_test \
        --images test_images/ --weights aerial_frcnn.pth
"""

from __future__ import annotations

import sys

from apse_uav_tpu.cli import detector_test


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # Aerial defaults (finetune_faster_rcnn_aerial.py: 3 classes, mask off,
    # R50 backbone) — explicit user flags still win.
    if "--num_classes" not in argv:
        argv += ["--num_classes", "3"]
    if "--depth" not in argv:
        argv += ["--depth", "50"]
    # --no_mask is a store_true flag downstream, so forcing it on would make
    # it impossible to enable the mask head; --with_mask opts back out.
    if "--with_mask" in argv:
        argv.remove("--with_mask")
    elif "--no_mask" not in argv:
        argv.append("--no_mask")
    return detector_test.main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
