"""Whole-scene eval wall time: serial vs thread-pool host path.

Round-3 VERDICT next #6: the single-device whole-scene loop built chunk
samples (coverage scoring + greedy view selection) serially on the consumer
thread. Round 4 parallelized it (eval/whole_scene._iter_scene_samples +
dispatch-ahead); this records the before/after on one synthetic scene at
standard eval settings (5 views/window) and at a 16-view variant where view
selection dominates harder.

Run on the TPU host: python tools/scene_eval_bench.py
Writes runs/r4_scene_eval_host.json.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from flax import nnx

from mvpnet_tpu.config import Config
from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.eval.whole_scene import predict_scene
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.step import prepare_batch


def main():
    cfg = Config()
    scene = make_scene(
        2, num_points=120000, num_frames=48, height=120, width=160, num_classes=20
    )
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()

    out = {"scene": {"points": len(scene.points), "frames": 48}}
    for label, views in (("5view", 5), ("16view", 16)):
        cfgv = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, num_views_eval=views)
        )
        graphdef, state = nnx.split(model)

        @jax.jit
        def forward_fn(batch):
            m = nnx.merge(graphdef, state)
            return m(prepare_batch(cfgv, batch, training=False))[0]

        res = {}
        for name, workers in (("serial", 0), ("pool8", 8)):
            t = []
            for i in range(3 if name == "pool8" else 3):
                t0 = time.perf_counter()
                logits = predict_scene(
                    model, cfgv, scene, batch_size=4, forward_fn=forward_fn,
                    num_workers=workers,
                )
                t.append(time.perf_counter() - t0)
            res[name] = round(min(t), 2)  # best-of-3 (first run pays compile)
            print(f"{label} {name}: {t}", file=sys.stderr, flush=True)
        res["speedup"] = round(res["serial"] / res["pool8"], 2)
        out[label] = res

    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_scene_eval_host.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
