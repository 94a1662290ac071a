"""End-to-end train-step breakdown + MFU accounting (SURVEY.md §5 tracing
row; round-1 VERDICT missing #7 / next #3).

Run on the TPU host:  python tools/step_profile.py [--steps 30]

Reports, as one JSON object on stdout:
  * compute_ms: jitted train-step wall time (params+batch resident)
  * data_ms: host time to produce + device_put one batch under the real
    threaded prefetcher (measured as consumer-side stall, i.e. what the
    train loop actually waits)
  * data_frac: data stall / total step
  * flops_per_step (XLA cost analysis) and MFU vs the v5e bf16 peak
"""
from __future__ import annotations

import argparse
import json
import time

import os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from flax import nnx

V5E_PEAK_FLOPS = 394e12  # bf16 per chip


def _timed(fn, *args, iters=10):
    import jax.numpy as jnp

    def sync(out):
        # materialize 4 ELEMENTS per output (axon block_until_ready lies;
        # full np.asarray bills MB-scale outputs to the ~38 MB/s tunnel and
        # polluted every round-2/3 segment number — PERF_NOTES round 4)
        jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), out)

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def breakdown(cfg, model, batch, key, loss_fn):
    """Per-segment step times: prepare / 2D net / fusion kNN / 3D net,
    forward and fwd+bwd — what the aggregate MFU number hides."""
    from flax import nnx
    from mvpnet_tpu import ops
    from mvpnet_tpu.train.step import prepare_batch

    graphdef, state = nnx.split(model)
    k = cfg.model.aggregation.k

    prep = jax.jit(lambda b, kk: prepare_batch(cfg, b, training=True, rng_key=kk))
    mb = prep(batch, key)

    def net2d(state, images):
        m = nnx.merge(graphdef, state)
        B, V, H, W, _ = images.shape
        return m.net_2d(images.reshape(B * V, H, W, 3))

    def pixels(state, mb):
        feat2d, _ = net2d(state, mb["images"])
        B, V, H, W, _ = mb["images"].shape
        return (
            feat2d.reshape(B, V * H * W, -1),
            mb["image_xyz"].reshape(B, V * H * W, 3),
        )

    pixel_feat, pixel_xyz = jax.jit(pixels)(state, mb)

    def fusion_knn(pts, pxyz):
        return ops.knn(pts, pxyz, k)

    def gather_agg(state, pts, pxyz, pfeat):
        m = nnx.merge(graphdef, state)
        _, idx = ops.knn(pts, pxyz, k)
        gf = ops.group_points(pfeat, idx)
        gx = ops.group_points(pxyz, idx)
        return m.aggregation(pts, gx, gf)

    fused = jax.jit(gather_agg)(state, mb["points"], pixel_xyz, pixel_feat)

    def net3d(state, pts, fused):
        m = nnx.merge(graphdef, state)
        return m.net_3d(pts, fused)

    def full_fwd(state, mb):
        m = nnx.merge(graphdef, state)
        return m(mb)[0]

    # fwd+bwd via the same nnx transform stack as the real train step (BN
    # stat mutation + grad w.r.t. Params only)
    @nnx.jit
    def grad_fn(model, mb):
        def loss(m):
            return loss_fn(m(mb), mb)

        return nnx.value_and_grad(loss)(model)[0]

    # per-subnet fwd+bwd: grads of a scalar of each stage's output w.r.t.
    # Params, through the same nnx transform stack as the real step (BN
    # batch-stat mutation included)
    import jax.numpy as jnp

    @nnx.jit
    def net2d_grad(model, images):
        def loss(m):
            B, V, H, W, _ = images.shape
            feat, logits = m.net_2d(images.reshape(B * V, H, W, 3))
            return jnp.sum(feat.astype(jnp.float32)) + jnp.sum(logits)

        return nnx.value_and_grad(loss)(model)[0]

    @nnx.jit
    def net3d_grad(model, pts, fused):
        def loss(m):
            return jnp.sum(m.net_3d(pts, fused))

        return nnx.value_and_grad(loss)(model)[0]

    @nnx.jit
    def agg_grad(model, pts, pxyz, pfeat):
        def loss(m):
            _, idx = ops.knn(pts, pxyz, k)
            gf = ops.group_points(pfeat, idx)
            gx = ops.group_points(pxyz, idx)
            return jnp.sum(m.aggregation(pts, gx, gf).astype(jnp.float32))

        return nnx.value_and_grad(loss)(model)[0]

    out = {}

    def add(name, fn, *a):
        out[name] = round(_timed(fn, *a), 2)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    add("prepare_ms", prep, batch, key)
    add("net2d_fwd_ms", jax.jit(net2d), state, mb["images"])
    add("net2d_grad_ms", net2d_grad, model, mb["images"])
    add("fusion_knn_ms", jax.jit(fusion_knn), mb["points"], pixel_xyz)
    add("agg_ms", jax.jit(gather_agg), state, mb["points"], pixel_xyz, pixel_feat)
    add("agg_grad_ms", agg_grad, model, mb["points"], pixel_xyz, pixel_feat)
    add("net3d_fwd_ms", jax.jit(net3d), state, mb["points"], fused)
    add("net3d_grad_ms", net3d_grad, model, mb["points"], fused)
    add("full_fwd_ms", jax.jit(full_fwd), state, mb)
    add("full_grad_ms", grad_fn, model, mb)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--breakdown", action="store_true")
    args = ap.parse_args(argv)

    from mvpnet_tpu.config import Config
    from mvpnet_tpu.data.pipeline import PrefetchIterator, build_dataset
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step

    cfg = Config()
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    train_step = make_train_step(cfg, loss_fn, metric_fn)

    ds = build_dataset(
        cfg.data, batch_size=args.batch_size, training=True, seed=0
    )
    it = PrefetchIterator(
        ds,
        prefetch=cfg.data.prefetch,
        num_threads=cfg.data.num_workers,
        pack=cfg.data.packed_transfer,
    )

    key = jax.random.key(0)
    # warm: compile + fill the prefetch queue
    batch = next(it)
    if args.breakdown:
        bd = breakdown(cfg, model, batch, key, loss_fn)
        it.close()
        print(json.dumps({"batch_size": args.batch_size, **bd}))
        return
    m = train_step(model, optimizer, batch, key)
    _ = np.asarray(m["loss"])

    # FLOPs from XLA cost analysis of the compiled step (donation disabled
    # for analysis-only lowering would complicate reuse; analyze a fresh
    # non-donating lowering of the same function)
    flops = None
    try:
        # lower the nnx.jit'd step and read XLA's cost analysis
        lowered = train_step.lower(model, optimizer, batch, key)
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", float("nan")))
    except Exception as e:  # cost analysis is best-effort on the axon backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    # measure: consumer-side data stall + step compute, like the train loop
    data_t, step_t = [], []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        batch = next(it)
        t1 = time.perf_counter()
        key, sub = jax.random.split(key)
        m = train_step(model, optimizer, batch, sub)
        _ = np.asarray(m["loss"])  # materialize: axon block_until_ready lies
        t2 = time.perf_counter()
        data_t.append(t1 - t0)
        step_t.append(t2 - t1)
    it.close()

    data_ms = float(np.mean(data_t) * 1e3)
    compute_ms = float(np.mean(step_t) * 1e3)
    total_ms = data_ms + compute_ms
    out = {
        "batch_size": args.batch_size,
        "steps": args.steps,
        "compute_ms": round(compute_ms, 2),
        "data_ms": round(data_ms, 2),
        "data_frac": round(data_ms / total_ms, 4),
        "chunks_per_sec": round(args.batch_size / (total_ms / 1e3), 2),
    }
    if flops:
        out["flops_per_step"] = flops
        out["mfu"] = round(flops / (compute_ms / 1e3) / V5E_PEAK_FLOPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
