"""CLI: pretrain the 2D semantic-segmentation UNet.

Reference entry point equivalent: ``python mvpnet/train_2d.py --cfg <yaml>``
(UNVERIFIED; SURVEY.md §3.6). Trains on the FULL frame corpus with random
frame sampling + 2D augmentation (data/frames.py — reference ScanNet2D
semantics; override ``data.sampling=chunks`` to train on view-selected chunk
frames instead). The best checkpoint of this run warm-starts the 3D fusion
training (model.pretrained_2d).
"""
from __future__ import annotations

from mvpnet_tpu.cli.train_3d import parse_args
from mvpnet_tpu.config import load_config
from mvpnet_tpu.train.loop import train


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(
        args.cfg,
        ["model.name=sem_seg_2d", "data.sampling=frames"] + list(args.opts),
    )
    train(cfg, resume=not args.no_resume)


if __name__ == "__main__":
    main()
