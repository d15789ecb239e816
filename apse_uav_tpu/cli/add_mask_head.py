"""Weight surgery CLI: graft a COCO mask head into a fine-tuned detector
(dcnn/scripts/add_mask_head_to_frcnn.py equivalent).

Copies mask-head weights from a source Mask R-CNN checkpoint into a
(possibly mask-less) detector checkpoint, slicing per-class predictor rows
for a reduced class set (reference :62-73 keeps car/truck/bus rows).
"""

from __future__ import annotations

import argparse
import pickle


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--detector", required=True, help="target detector checkpoint (.pkl/.pth)")
    p.add_argument("--mask_source", required=True, help="COCO Mask R-CNN checkpoint with the mask head")
    p.add_argument("--out", required=True, help="output .pkl")
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument(
        "--class_rows", type=int, nargs="+", default=[2, 7, 5],
        help="source class indices to keep (default COCO car/truck/bus)",
    )
    p.add_argument("--num_src_classes", type=int, default=80)
    args = p.parse_args(argv)

    from apse_uav_tpu.dcnn import weights as W

    det = W.map_detectron2_weights(W.load_torch_file(args.detector), args.depth, mask_on=False)
    src = W.map_detectron2_weights(W.load_torch_file(args.mask_source), args.depth, mask_on=True)
    src_sliced = W.slice_predictor_classes(
        {k: v for k, v in src.items() if k.startswith("mask_head/")},
        args.class_rows, args.num_src_classes,
    )
    merged = W.merge_mask_head(det, src_sliced)
    with open(args.out, "wb") as f:
        pickle.dump({"model": merged, "__author__": "apse_uav_tpu"}, f)
    print(f"wrote {args.out}: {len(merged)} tensors ({len(src_sliced)} mask-head grafts)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
