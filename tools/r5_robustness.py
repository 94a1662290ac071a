"""Robustness under point subsampling: fusion vs geometry-only (round 5).

The paper's robustness claim (BASELINE.md row: "MVPNet degrades gracefully
under point subsampling vs steep drop for geometry-only baselines" —
SURVEY.md §6, qualitative figure) was the last baseline-table row with no
measured counterpart in this repo. This evaluates the trained fusion model
and the xyz-only PN2SSG ablation on the SAME held-out synthetic scenes at
per-chunk point budgets 8192 -> 1024 (chunk sampling density, the analog of
the paper's input subsampling; 1024 is the floor — SA1's npoint).

Prereqs (run first; ~20 min total on this host):
  train_2d  ... output_dir=outputs/r5_rob/sem_seg_2d
  train_3d  ... model.pretrained_2d=... output_dir=outputs/r5_rob/mvpnet_3d
  train_3d  --cfg configs/scannet/pn2ssg_xyz.yaml data.name=synthetic ...
            output_dir=outputs/r5_rob/pn2ssg_xyz

Run on the TPU host: python tools/r5_robustness.py
Writes runs/r5_robustness.json.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import nnx

BUDGETS = (8192, 4096, 2048, 1024)
N_SCENES = 4
COMMON = [
    "data.name=synthetic",
    "data.num_classes=20",
    "data.synthetic_scenes=16",
    "data.synthetic_objects=12",
]


def main():
    from mvpnet_tpu.config import load_config
    from mvpnet_tpu.data.pipeline import build_dataset
    from mvpnet_tpu.eval.whole_scene import evaluate_scenes
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.checkpoint import Checkpointer

    runs = {
        "mvpnet_3d": load_config(
            "configs/scannet/mvpnet_3d_unet_resnet34_pn2ssg.yaml",
            COMMON + ["output_dir=outputs/r5_rob/mvpnet_3d"],
        ),
        "pn2ssg_xyz": load_config(
            "configs/scannet/pn2ssg_xyz.yaml",
            COMMON + ["output_dir=outputs/r5_rob/pn2ssg_xyz"],
        ),
    }
    out = {"budgets": list(BUDGETS), "models": {}}
    for name, cfg in runs.items():
        model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
        ckpt = Checkpointer(f"{cfg.output_dir}/checkpoints")
        step = ckpt.restore(model)
        ckpt.close()
        assert step is not None, f"no checkpoint for {name} under {cfg.output_dir}"
        model.eval()
        curve = {}
        for np_budget in BUDGETS:
            cfg_b = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, num_points=np_budget)
            )
            ds = build_dataset(cfg_b.data, batch_size=1, training=False, seed=0)
            scenes = list(ds.scenes)[:N_SCENES]
            res = evaluate_scenes(model, cfg_b, scenes, batch_size=4)
            curve[np_budget] = round(float(res["miou"]), 4)
            print(f"{name} @ {np_budget} pts: mIoU {curve[np_budget]}",
                  file=sys.stderr, flush=True)
        full = curve[BUDGETS[0]]
        out["models"][name] = {
            "restored_step": int(step),
            "miou": curve,
            "relative_at_min_budget": round(curve[BUDGETS[-1]] / max(full, 1e-9), 3),
        }

    # the claim under test: the fusion model retains a larger fraction of
    # its full-budget mIoU at the smallest budget than the xyz-only baseline
    rel = {k: v["relative_at_min_budget"] for k, v in out["models"].items()}
    out["fusion_degrades_more_gracefully"] = bool(
        rel.get("mvpnet_3d", 0) > rel.get("pn2ssg_xyz", 1)
    )
    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_robustness.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
