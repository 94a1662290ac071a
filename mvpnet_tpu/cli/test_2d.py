"""CLI: evaluate the 2D semantic-segmentation UNet on val frames.

Reference entry point equivalent: ``python mvpnet/test_2d.py`` [U]
(SURVEY.md §1 L5). Reports pixel accuracy + per-class IoU/mIoU over the val
scenes' frames.
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import jax
from flax import nnx

from mvpnet_tpu.config import load_config
from mvpnet_tpu.data.pipeline import build_dataset
from mvpnet_tpu.eval.whole_scene import Evaluator
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.checkpoint import Checkpointer
from mvpnet_tpu.utils.logger import setup_logger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.cfg, ["model.name=sem_seg_2d"] + list(args.opts))
    logger = setup_logger(output_dir=cfg.output_dir)
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    ckpt = Checkpointer(f"{cfg.output_dir}/checkpoints")
    step = ckpt.restore(model)
    if step is None:
        raise SystemExit(
            f"no checkpoint found under {cfg.output_dir}/checkpoints — "
            "train first or point output_dir at a trained run"
        )
    logger.info("restored checkpoint step=%s", step)
    model.eval()

    @jax.jit
    def forward(images):
        # SemSeg2D takes the standard batch dict with a views axis
        _, logits = model({"images": images[:, None]})
        return logits[:, 0]

    ds = build_dataset(cfg.data, batch_size=1, training=False, seed=0)
    evaluator = Evaluator(cfg.data.num_classes, cfg.data.ignore_label)
    bs = args.batch_size
    for scene in ds.scenes:
        frames = scene.rgb
        labels = scene.label_2d
        for i in range(0, len(frames), bs):
            imgs = frames[i : i + bs]
            if len(imgs) < bs:  # pad to the compiled batch shape
                pad = bs - len(imgs)
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            logits = np.asarray(forward(imgs.astype(np.float32)))
            n = min(bs, len(frames) - i)
            pred = logits[:n].argmax(-1)
            lab = labels[i : i + n]
            valid = scene.depth[i : i + n] > 0
            evaluator.update(
                pred[valid], lab[valid]
            )
    results = evaluator.results()
    logger.info("2D results: %s", json.dumps(results, indent=2))
    print(json.dumps(results))
    ckpt.close()


if __name__ == "__main__":
    main()
