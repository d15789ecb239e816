"""UAVDT aerial fine-tuning (dcnn/scripts/train/finetune_faster_rcnn_aerial.py).

3-class vehicle detector, masks off; optionally restrict training to RPN +
box regression (reference :65-68 param filter).
"""

from __future__ import annotations

import argparse
import dataclasses


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--uavdt_dir", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--depth", type=int, default=50, choices=(50, 101))
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--max_iter", type=int, default=1000)
    p.add_argument("--test_period", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--rpn_only", action="store_true", help="train RPN + box regression only")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.data import generate_uav_dataset_dictionaries
    from apse_uav_tpu.data.loader import DetectionLoader, LoaderConfig
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.train.loop import finetune_detector

    dicts = generate_uav_dataset_dictionaries(args.uavdt_dir)
    if not dicts:
        raise SystemExit("no UAVDT data found")
    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = dataclasses.replace(make(num_classes=args.num_classes), mask_on=False)
    init_params = None
    if args.weights:
        model = MaskRCNN(cfg=cfg)
        init_params = jax.jit(
            lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
        )(jax.random.PRNGKey(0))
        flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, False)
        init_params, _, _ = W.load_into_params(init_params, flat)
    lcfg = LoaderConfig(batch_size=args.batch_size)
    to_train = ("proposal_generator", "box_head") if args.rpn_only else ("proposal_generator", "roi_heads")
    finetune_detector(
        cfg,
        iter(DetectionLoader(dicts, lcfg, training=True)),
        lambda: DetectionLoader(dicts[:50], lcfg, training=False),
        args.workdir,
        max_iter=args.max_iter,
        to_train=to_train,
        lr=args.lr,
        test_period=args.test_period,
        init_params=init_params,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
