"""Association-head embedding check (association_head_test.py equivalent).

The reference test is interactive (click a GT track on frame 1, eyeball
embedding distances on later frames, :110-126).  This version is scriptable:
pick a GT track id on the first annotated frame of a MOT sequence, then
report per-frame embedding distances from that anchor to every GT instance —
the anchor's own track should be the closest.  Optionally writes annotated
frames.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--sequence", required=True, help="MOT sequence dir (img1/, gt/, seqinfo.ini)")
    p.add_argument("--weights", required=True, help="detector checkpoint for the frozen backbone")
    p.add_argument("--assoc_weights", default=None, help="association head checkpoint (orbax dir)")
    p.add_argument("--track_id", type=int, default=None, help="anchor GT id (default: first)")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--roi_size", type=int, default=8)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.data.mot import MOTLoader, RoiFeaturesGenerator
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.models.association import AssociationHead
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W

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
    loader = MOTLoader(args.sequence, gen, frames_in_batch=1)

    head = AssociationHead()
    assoc_params = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.fpn_channels, args.roi_size, args.roi_size))
    )["params"]
    if args.assoc_weights:
        import os

        from apse_uav_tpu.train.checkpoint import load_state

        state = load_state(os.path.dirname(args.assoc_weights) or ".", os.path.basename(args.assoc_weights))
        if state is not None:
            assoc_params = state["params"]

    # Anchor embedding from frame 1.
    ids0, rois0 = loader.get_training_batch(0)
    anchor_id = args.track_id if args.track_id is not None else int(ids0[0])
    if anchor_id not in ids0:
        raise SystemExit(f"track id {anchor_id} not on frame 1 (ids: {sorted(set(ids0))})")
    emb0 = np.asarray(head.apply({"params": assoc_params}, jnp.asarray(rois0)))
    anchor = emb0[list(ids0).index(anchor_id)]

    correct = 0
    total = 0
    for f in range(1, min(args.frames, loader.num_of_batches)):
        ids, rois = loader.get_training_batch(f)
        if len(ids) == 0:
            continue
        emb = np.asarray(head.apply({"params": assoc_params}, jnp.asarray(rois)))
        d = np.linalg.norm(emb - anchor[None], axis=1)
        order = np.argsort(d)
        line = ", ".join(f"id {ids[i]}: {d[i]:.3f}" for i in order[:5])
        nearest = ids[order[0]]
        mark = "OK" if nearest == anchor_id else "MISS"
        if anchor_id in ids:
            total += 1
            correct += int(nearest == anchor_id)
        print(f"frame {f + 1} [{mark}]: {line}")
    if total:
        print(f"anchor id {anchor_id}: nearest-neighbor accuracy {correct}/{total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
