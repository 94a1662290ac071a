"""Quantify the single-device vs space-sharded whole-scene ESTIMATOR delta
(round-2 VERDICT weak #4).

The two eval modes are different estimators of the same labels: the
single-device chunk loop selects ~num_views_eval views PER CHUNK
(eval/whole_scene.py), while the sharded mode selects one scene-level view
set and fuses every chunk against the full scene pixel cloud
(eval/sharded_scene.py, documented there). The sharded path is verified
bit-equivalent to its own oracle in tests/test_dist.py; this tool measures
the METRIC-level gap between the estimators: train a small fusion model
briefly on synthetic scenes, evaluate the same scenes both ways, and report
both mIoUs + per-point prediction agreement.

Run on the 8-device virtual CPU mesh:
  python tools/estimator_delta.py        (forces cpu x8 itself)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from flax import nnx


def main():
    import dataclasses

    from mvpnet_tpu.config import (
        AggregationConfig,
        Config,
        DataConfig,
        EvalConfig,
        MeshConfig,
        ModelConfig,
        PN2SSGConfig,
        SetAbstractionConfig,
        TrainConfig,
        UNetConfig,
    )
    from mvpnet_tpu.dist.mesh import make_mesh
    from mvpnet_tpu.eval.whole_scene import Evaluator, evaluate_scenes, predict_scene
    from mvpnet_tpu.eval.sharded_scene import predict_scene_sharded
    from mvpnet_tpu.data.pipeline import build_dataset
    from mvpnet_tpu.train.loop import train

    data = DataConfig(
        name="synthetic",
        num_points=512,
        num_views_train=2,
        num_views_eval=3,
        image_height=24,
        image_width=32,
        num_classes=5,
        max_candidate_frames=8,
        chunk_size=2.0,
        chunk_stride=1.5,
        num_workers=2,
    )
    model_cfg = ModelConfig(
        name="mvpnet_3d",
        unet=UNetConfig(
            num_classes=5,
            base_channels=8,
            stage_channels=(8, 16, 16, 32),
            stage_blocks=(1, 1, 1, 1),
            decoder_channels=(16, 16, 8, 8),
            feature_channels=8,
            dtype="float32",
        ),
        aggregation=AggregationConfig(k=3, mlp_channels=(8, 8)),
        pn2=PN2SSGConfig(
            num_classes=5,
            in_channels=8,
            sa=(
                SetAbstractionConfig(64, 0.3, 8, (16, 16)),
                SetAbstractionConfig(16, 0.6, 8, (16, 32)),
            ),
            fp_channels=((32,), (32, 16)),
            head_channels=16,
            dtype="float32",
        ),
    )
    cfg = Config(
        model=model_cfg,
        data=data,
        train=TrainConfig(
            batch_size=8,
            max_steps=150,
            log_every=50,
            val_every=150,
            val_steps=5,
            ckpt_every=150,
            donate=False,
        ),
        eval=EvalConfig(scene_views=6, chunks_per_shard=1),
        mesh=MeshConfig(data=8, space=1),
        output_dir="/tmp/estimator_delta_run",
    )

    model, _ = train(cfg, resume=False)
    model.eval()

    # >=10 fresh scenes (round-3 VERDICT weak #7: two scenes were too few
    # to trust the delta's sign)
    from mvpnet_tpu.data.synthetic import make_scene
    from mvpnet_tpu.eval.scene_fused import predict_scene_fused

    scenes = [
        make_scene(
            800 + i,
            num_points=15000,
            num_frames=8,
            height=cfg.data.image_height,
            width=cfg.data.image_width,
            num_classes=cfg.data.num_classes,
        )
        for i in range(10)
    ]

    mesh = make_mesh(MeshConfig(data=4, space=2))

    evs = {
        k: Evaluator(cfg.data.num_classes, cfg.data.ignore_label)
        for k in ("single", "sharded", "fused")
    }
    agree_ss, agree_fs = [], []
    for scene in scenes:
        preds = {
            "single": predict_scene(model, cfg, scene, batch_size=4).argmax(1),
            "sharded": predict_scene_sharded(model, cfg, scene, mesh).argmax(1),
            "fused": predict_scene_fused(model, cfg, scene).argmax(1),
        }
        for k, p in preds.items():
            evs[k].update(p, scene.labels)
        agree_ss.append(float((preds["single"] == preds["sharded"]).mean()))
        agree_fs.append(float((preds["fused"] == preds["sharded"]).mean()))

    out = {
        "scenes": len(scenes),
        "single_device_miou": float(evs["single"].results()["miou"]),
        "sharded_miou": float(evs["sharded"].results()["miou"]),
        "fused_miou": float(evs["fused"].results()["miou"]),
        "agreement_single_vs_sharded": float(np.mean(agree_ss)),
        "agreement_fused_vs_sharded": float(np.mean(agree_fs)),
        "note": (
            "single (per-chunk view sets) is a DIFFERENT estimator from "
            "sharded/fused (one scene-level view set) by design — "
            "eval/sharded_scene.py docstring. fused (eval/scene_fused.py) "
            "is the sharded estimator on one device: its agreement with "
            "sharded bounds pure sharding effects, so sharded mIoU is "
            "quotable against the fused single-device number 1:1 "
            "(round-3 VERDICT next #5)."
        ),
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_estimator_delta.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
