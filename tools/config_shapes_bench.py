"""Run BASELINE configs #3 and #4 AT SHAPE on the chip (round-3 VERDICT
next #3: both existed as YAML only — no committed step time, memory
footprint, or donate/remat decision).

  * config #3 (configs/scannet/mvpnet_3d_32k_chunks.yaml): one real
    training step at 32k pts x batch 32 — rolled device-resident step time,
    HBM footprint, donate/remat A/B (their stated purpose, config.py).
  * config #4 (configs/scannet/mvpnet_3d_highres_64view.yaml): single-chip
    64-view whole-scene eval END TO END through eval/scene_fused.py —
    per-scene wall time with the per-scene prep (2D net + lift + Morton
    prep) and per-chunk prepared-kNN fusion split out.

Run on the TPU host: python tools/config_shapes_bench.py [--only 3|4]
Writes runs/r4_config_shapes.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx


def hbm_stats():
    try:
        s = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use": int(s.get("bytes_in_use", -1)),
            "peak_bytes_in_use": int(s.get("peak_bytes_in_use", -1)),
        }
    except Exception as e:  # axon backend may not expose stats
        return {"error": str(e)}


def bench_config3(out):
    from __graft_entry__ import _example_batch
    from mvpnet_tpu.config import load_config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import prepare_batch

    from mvpnet_tpu.train.step import make_train_step

    cfg = load_config("configs/scannet/mvpnet_3d_32k_chunks.yaml")
    B, N, V, H, W = cfg.train.batch_size, cfg.data.num_points, 3, 120, 160
    print(
        f"config #3: B{B} N{N} V{V} grad_accum={cfg.train.grad_accum}",
        file=sys.stderr,
        flush=True,
    )

    rng = np.random.default_rng(0)
    batch = jax.device_put(_example_batch(rng, B=B, N=N, V=V, H=H, W=W))
    key = jax.random.key(0)

    res = {
        "shape": {"B": B, "N": N, "V": V, "H": H, "W": W},
        "grad_accum": cfg.train.grad_accum,
        "note": "monolithic B32 and B16 programs crash the tunnel "
        "compile-helper (HTTP 500); grad_accum=4 runs the full batch as "
        "4 x B8 microbatches in one lax.scan step",
    }
    for variant, donate, remat in (
        ("base", False, False),
        ("donate", True, False),
        ("remat", False, True),
    ):
        cfgv = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, donate=donate, remat=remat),
        )
        model, loss_fn, metric_fn = build_model(cfgv, rngs=nnx.Rngs(0))
        # build_model wires model.remat_2d from cfgv.train.remat
        optimizer = nnx.Optimizer(
            model, build_optimizer(cfgv.solver), wrt=nnx.Param
        )
        step = make_train_step(cfgv, loss_fn, metric_fn)
        try:
            t0 = time.perf_counter()
            m = step(model, optimizer, batch, key)
            _ = np.asarray(m["loss"])
            compile_s = time.perf_counter() - t0
            ITERS = 5
            t0 = time.perf_counter()
            for i in range(ITERS):
                m = step(model, optimizer, batch, jax.random.fold_in(key, i))
            loss = np.asarray(m["loss"])  # 4-byte sync
            step_ms = (time.perf_counter() - t0) / ITERS * 1e3
            res[variant] = {
                "step_ms": round(step_ms, 1),
                "chunks_per_sec": round(B / (step_ms / 1e3), 2),
                "compile_s": round(compile_s, 1),
                "loss": float(loss),
                "hbm": hbm_stats(),
            }
        except Exception as e:
            res[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
        print(f"  {variant}: {res[variant]}", file=sys.stderr, flush=True)
        del model, optimizer, step
    out["config3"] = res


def bench_config4(out):
    from mvpnet_tpu.config import load_config
    from mvpnet_tpu.data.synthetic import make_scene
    from mvpnet_tpu.eval.scene_fused import (
        build_scene_fused_fns,
        predict_scene_fused,
    )
    from mvpnet_tpu.models import build_model

    cfg = load_config("configs/scannet/mvpnet_3d_highres_64view.yaml")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, name="synthetic"),
        eval=dataclasses.replace(cfg.eval, scene_views=64, batch_size=1),
    )
    print("config #4: building 64-frame scene", file=sys.stderr, flush=True)
    scene = make_scene(
        0,
        num_points=300000,
        num_frames=64,
        height=cfg.data.image_height,
        width=cfg.data.image_width,
        num_classes=cfg.data.num_classes,
    )
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    fns = build_scene_fused_fns(model, cfg)

    # warm (compile every group size this scene produces)
    t0 = time.perf_counter()
    logits = predict_scene_fused(model, cfg, scene, fns=fns, chunk_group=1)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    logits = predict_scene_fused(model, cfg, scene, fns=fns, chunk_group=1)
    scene_s = time.perf_counter() - t0

    # split: per-scene prep (lift + 2D + knn_prepare) vs per-chunk fusion
    state, pixel_fn, prepare_fn, fuse_fn = fns
    from mvpnet_tpu.eval.sharded_scene import (
        enumerate_scene_chunks,
        select_scene_views,
    )

    frames = select_scene_views(scene, 64)
    args = (
        state,
        jax.device_put(scene.rgb[frames].astype(np.float32)),
        jax.device_put(scene.depth[frames].astype(np.float32)),
        jax.device_put(scene.poses[frames].astype(np.float32)),
        jax.device_put(scene.intrinsics.astype(np.float32)),
    )
    t0 = time.perf_counter()
    pixel_xyz, pixel_feat = pixel_fn(*args)
    _ = np.asarray(jnp.ravel(pixel_feat)[:4])
    pixel_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    prepared = prepare_fn(pixel_xyz)
    _ = np.asarray(jnp.ravel(prepared.rT4)[:4])
    prep_s = time.perf_counter() - t0
    chunks = enumerate_scene_chunks(scene, cfg)
    pts = np.stack([chunks[0][1]])
    fuse = lambda: np.asarray(
        jnp.ravel(fuse_fn(state, jax.device_put(pts), prepared, pixel_xyz, pixel_feat))[:4]
    )
    fuse()
    t0 = time.perf_counter()
    fuse()
    fuse_s = time.perf_counter() - t0

    out["config4"] = {
        "scene": {
            "points": len(scene.points),
            "views": 64,
            "pixels": int(pixel_xyz.shape[1]),
            "chunk_points": cfg.data.num_points,
            "n_chunks": len(chunks),
        },
        "scene_eval_s": round(scene_s, 2),
        "scene_eval_warm_s": round(warm_s, 2),
        "pixel_stage_ms": round(pixel_s * 1e3, 1),
        "knn_prepare_ms": round(prep_s * 1e3, 1),
        "fuse_per_chunk_ms": round(fuse_s * 1e3, 1),
        "hbm": hbm_stats(),
        "logits_shape": list(np.asarray(logits).shape),
    }
    print(f"  config4: {out['config4']}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, choices=["3", "4"])
    args = ap.parse_args()
    out = {}
    if args.only in (None, "4"):
        bench_config4(out)
    if args.only in (None, "3"):
        bench_config3(out)
    os.makedirs("runs", exist_ok=True)
    path = "runs/r4_config_shapes.json"
    if os.path.exists(path) and args.only:
        with open(path) as fh:
            prev = json.load(fh)
        prev.update(out)
        out = prev
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
