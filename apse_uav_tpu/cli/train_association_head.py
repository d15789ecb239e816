"""Association-head triplet training on KITTI-MOTS
(dcnn/scripts/train/train_association_head.py equivalent).

A frozen backbone (PartialCheckpointer semantics) produces ROI features for
every GT instance; batches of consecutive annotated frames feed the
batch-hard triplet loss (margin 0.2, SGD 0.01/0.9); per-epoch checkpoints
and train_info.txt land in --workdir.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--instances_txt", required=True, help="KITTI-MOTS instances_txt folder")
    p.add_argument("--images", required=True, help="KITTI-MOTS images root")
    p.add_argument("--seqmap", required=True)
    p.add_argument("--weights", required=True, help="detector checkpoint for the frozen backbone")
    p.add_argument("--workdir", required=True)
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--frames_in_batch", type=int, default=4)
    p.add_argument("--roi_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--margin", type=float, default=0.2)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.data.mot import MOTSLoader, RoiFeaturesGenerator
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.evaluation.mots import load_seqmap
    from apse_uav_tpu.train.loop import train_association_head

    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = make()
    model = MaskRCNN(cfg=cfg)
    params = jax.jit(
        lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, cfg.mask_on)
    params, _, _ = W.load_into_params(params, flat)

    backbone_fn = jax.jit(lambda imgs: model.apply({"params": params}, imgs, mode="backbone"))
    gen = RoiFeaturesGenerator(backbone_fn, roi_size=args.roi_size)
    seq_names, _ = load_seqmap(args.seqmap)
    loader = MOTSLoader(args.instances_txt, args.images, seq_names, gen, args.frames_in_batch)

    batches = [(seq, i) for seq in seq_names for i in range(loader.num_batches(seq))]

    def batch_fn(i):
        seq, b = batches[i]
        return loader.get_training_batch(seq, b)

    train_association_head(
        batch_fn,
        num_batches=len(batches),
        workdir=args.workdir,
        epochs=args.epochs,
        roi_feature_shape=(cfg.fpn_channels, args.roi_size, args.roi_size),
        lr=args.lr,
        margin=args.margin,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
