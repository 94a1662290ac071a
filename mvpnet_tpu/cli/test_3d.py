"""CLI: whole-scene sliding-window evaluation.

Reference entry point equivalent: ``python mvpnet/test_3d.py --cfg <yaml>``
(UNVERIFIED; SURVEY.md §3.2): restore the best checkpoint, slide chunks over
each val scene, accumulate logits, report per-class IoU + mIoU, optionally
export ScanNet benchmark .txt files.
"""
from __future__ import annotations

import argparse
import json

from flax import nnx

from mvpnet_tpu.config import load_config
from mvpnet_tpu.data.pipeline import build_dataset
from mvpnet_tpu.eval.whole_scene import evaluate_scenes
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.checkpoint import Checkpointer
from mvpnet_tpu.utils.logger import setup_logger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--export", default=None, help="benchmark export dir")
    # default None -> cfg.eval.batch_size (CLI wins when given)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--sharded",
        action="store_true",
        help="space-sharded whole-scene inference over the cfg.mesh space "
        "axis (scene-level view set + ring fusion; eval/sharded_scene.py)",
    )
    ap.add_argument(
        "--fused",
        action="store_true",
        help="single-device scene-view-set inference with a prepared pixel "
        "cloud (the sharded estimator on one chip; eval/scene_fused.py)",
    )
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.cfg, args.opts)
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

    mesh = None
    if args.sharded or cfg.eval.sharded:
        from mvpnet_tpu.dist.mesh import make_mesh

        mesh = make_mesh(cfg.mesh)
        logger.info("sharded whole-scene eval over mesh %s", dict(mesh.shape))

    # evaluate on the validation scenes
    ds = build_dataset(cfg.data, batch_size=1, training=False, seed=0)
    results = evaluate_scenes(
        model,
        cfg,
        ds.scenes,
        batch_size=args.batch_size or cfg.eval.batch_size,
        export_dir=args.export,
        mesh=mesh,
        fused=args.fused or cfg.eval.fused,
    )
    logger.info("results: %s", json.dumps(results, indent=2))
    print(json.dumps(results))
    ckpt.close()


if __name__ == "__main__":
    main()
