"""Reproducible end-to-end training artifact on synthetic data (round-2
VERDICT next #4): frame-level 2D pretrain -> 2D warm-start -> 3D fusion
train -> whole-scene eval in BOTH modes (single-device chunk loop and
space-sharded ring fusion on a virtual mesh), with configs, metrics.jsonl,
and final mIoUs landing under runs/<name>/.

The synthetic corpus (data/synthetic.make_scene) stands in for ScanNet —
the machine has no dataset (SURVEY.md provenance banner) — so the numbers
demonstrate the *system* (pipeline, warm-start, both eval estimators, and
their delta), not ScanNet-level accuracy.

Run: python tools/e2e_run.py [--out runs/r3_e2e] [--steps-2d N]
     [--steps-3d N] (defaults sized for the single v5e chip, ~15 min)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/r3_e2e")
    ap.add_argument("--steps-2d", type=int, default=300)
    ap.add_argument("--steps-3d", type=int, default=300)
    ap.add_argument("--eval-scenes", type=int, default=2)
    # corpus size (round-5 VERDICT item 4: the round-3 run left 11/20
    # classes at 0.0 IoU — 4 scenes x 6 random-class objects cannot cover
    # 18 object classes; scale both up for plateau runs)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--objects", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    from flax import nnx

    from mvpnet_tpu.config import load_config, save_config
    from mvpnet_tpu.eval.whole_scene import evaluate_scenes
    from mvpnet_tpu.train.loop import train

    os.makedirs(args.out, exist_ok=True)
    common = [
        "data.name=synthetic",
        "data.num_classes=20",
        f"data.synthetic_scenes={args.scenes}",
        f"data.synthetic_objects={args.objects}",
        "train.log_every=20",
        "train.donate=true",
    ]

    # ---- stage 1: frame-level 2D pretraining (reference train_2d, §3.6) ----
    out2d = f"{args.out}/sem_seg_2d"
    cfg2d = load_config(
        None,
        [
            "model.name=sem_seg_2d",
            "data.sampling=frames",
            f"train.max_steps={args.steps_2d}",
            f"train.val_every={args.steps_2d}",
            "train.val_steps=10",
            f"train.ckpt_every={args.steps_2d}",
            f"output_dir={out2d}",
        ]
        + common,
    )
    _, val2d = train(cfg2d, resume=False)
    print("2D pretrain val:", val2d["miou"], flush=True)

    # ---- stage 2: 3D fusion training, warm-started from stage 1 ----
    out3d = f"{args.out}/mvpnet_3d"
    cfg3d = load_config(
        None,
        [
            "model.name=mvpnet_3d",
            f"model.pretrained_2d={out2d}/checkpoints",
            f"train.max_steps={args.steps_3d}",
            f"train.val_every={max(args.steps_3d // 2, 1)}",
            "train.val_steps=10",
            f"train.ckpt_every={args.steps_3d}",
            f"output_dir={out3d}",
        ]
        + common,
    )
    model, val3d = train(cfg3d, resume=False)
    print("3D train val:", val3d["miou"], flush=True)

    # ---- stage 3: whole-scene eval, both estimators ----
    from mvpnet_tpu.data.pipeline import build_dataset

    ds = build_dataset(cfg3d.data, batch_size=1, training=False, seed=123)
    scenes = list(ds.scenes)[: args.eval_scenes]
    model.eval()
    res_single = evaluate_scenes(model, cfg3d, scenes, batch_size=4)
    print("single-device whole-scene:", res_single["miou"], flush=True)

    # sharded estimator on a virtual CPU mesh is run by tools/estimator_delta.py
    # (the chip count here is 1); record the single-chip results + configs
    results = {
        "val_2d_miou": float(val2d["miou"]),
        "val_3d_miou": float(val3d["miou"]),
        "whole_scene_single": res_single,
        "steps_2d": args.steps_2d,
        "steps_3d": args.steps_3d,
        "devices": str(jax.devices()),
    }

    def tolist(o):
        return o.tolist() if hasattr(o, "tolist") else str(o)

    with open(f"{args.out}/results.json", "w") as f:
        json.dump(results, f, indent=2, default=tolist)
    # keep the artifact small: configs + metrics stay, checkpoints go
    for sub in (out2d, out3d):
        shutil.rmtree(f"{sub}/checkpoints", ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
