"""Eval-forward decomposition — the headline metric's own profile.

Round-3 VERDICT weak #3 / next #1a: BENCH's scenes/s number comes from the
eval forward, but only the train step ever got a breakdown, and the bench
loop dispatched each forward over the ~25 ms/RPC tunnel, flooring the
measurement above the device time. This tool measures, at the bench's exact
eval shapes (B4, N=8192, V=5, 120x160):

  * per-segment device times (prepare / 2D net / fusion kNN / gather+agg /
    3D net) with the 4-element D2H sync discipline (never materialize
    MB-scale outputs over the ~38 MB/s tunnel), and
  * the full forward BOTH ways: tunnel-dispatched per call (what bench.py
    used to report) and DEVICE-RESIDENT (a lax.fori_loop of K forwards
    inside ONE jit, chained through a scalar carry so XLA cannot hoist the
    loop-invariant body) — the honest per-forward device time.

Run on the TPU host: python tools/eval_profile.py
Writes runs/r4_eval_profile.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

B, N, V, H, W = 4, 8192, 5, 120, 160
LOOP_ITERS = 20


def _sync(out):
    jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), out)


def timed(name, f, *args, iters=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s}: {dt:8.2f} ms", file=sys.stderr, flush=True)
    return out, dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop-iters", type=int, default=LOOP_ITERS)
    ap.add_argument("--out", default="runs/r4_eval_profile.json")
    args = ap.parse_args(argv)

    from __graft_entry__ import _example_batch
    from mvpnet_tpu import ops
    from mvpnet_tpu.config import Config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.step import prepare_batch

    cfg = Config()
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    graphdef, state = nnx.split(model)
    k = cfg.model.aggregation.k

    rng = np.random.default_rng(0)
    batch = jax.device_put(_example_batch(rng, B=B, N=N, V=V, H=H, W=W))

    res = {}

    # ---- segments (each jitted separately; 4-element sync) ----
    prep = jax.jit(lambda b: prepare_batch(cfg, b, training=False))
    mb, res["prepare_ms"] = timed("prepare (lift)", prep, batch)
    mb = jax.tree.map(jnp.asarray, mb)

    def net2d(state, images):
        m = nnx.merge(graphdef, state)
        return m.net_2d(images.reshape(B * V, H, W, 3))

    (feat2d, _), res["net2d_ms"] = timed(
        "net2d fwd", jax.jit(net2d), state, mb["images"]
    )
    pixel_feat = jnp.reshape(feat2d, (B, V * H * W, -1))
    pixel_xyz = jnp.reshape(mb["image_xyz"], (B, V * H * W, 3))

    _, res["fusion_knn_ms"] = timed(
        "fusion kNN",
        jax.jit(lambda q, r: ops.knn(q, r, k)),
        mb["points"],
        pixel_xyz,
    )

    def gather_agg(state, pts, pxyz, pfeat):
        m = nnx.merge(graphdef, state)
        _, idx = ops.knn(pts, pxyz, k)
        gf = ops.group_points(pfeat, idx)
        gx = ops.group_points(pxyz, idx)
        return m.aggregation(pts, gx, gf)

    fused, res["knn_gather_agg_ms"] = timed(
        "kNN+gather+agg",
        jax.jit(gather_agg),
        state,
        mb["points"],
        pixel_xyz,
        pixel_feat,
    )

    def net3d(state, pts, fused):
        m = nnx.merge(graphdef, state)
        return m.net_3d(pts, fused)

    _, res["net3d_ms"] = timed(
        "net3d fwd", jax.jit(net3d), state, mb["points"], fused
    )

    # ---- full forward, tunnel-dispatched per call (legacy bench loop) ----
    def full(state, batch):
        m = nnx.merge(graphdef, state)
        return m(prepare_batch(cfg, batch, training=False))[0]

    _, res["full_fwd_dispatch_ms"] = timed(
        "full fwd (per-call RPC)", jax.jit(full), state, batch
    )

    # ---- full forward, device-resident rolled loop ----
    def rolled(state, batch, iters):
        def body(i, carry):
            b = dict(batch)
            # chain iterations through the carry: the perturbation is exactly
            # 0 in f32 arithmetic (|carry|*1e-30 << ulp(points)) but makes
            # the body depend on the previous iteration, so XLA can neither
            # hoist the forward out of the loop nor run iterations as one
            b["points"] = batch["points"] + carry * 1e-30
            m = nnx.merge(graphdef, state)
            logits = m(prepare_batch(cfg, b, training=False))[0]
            return jnp.sum(logits[0, 0]) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rolled_jit = jax.jit(rolled, static_argnums=2)
    it = args.loop_iters
    _ = np.asarray(rolled_jit(state, batch, it))  # compile
    t0 = time.perf_counter()
    _ = np.asarray(rolled_jit(state, batch, it))
    per = (time.perf_counter() - t0) / it * 1e3
    res["full_fwd_device_ms"] = per
    print(f"{'full fwd (device loop)':28s}: {per:8.2f} ms", file=sys.stderr)

    seg_sum = (
        res["prepare_ms"]
        + res["net2d_ms"]
        + res["knn_gather_agg_ms"]
        + res["net3d_ms"]
    )
    out = {
        "shape": {"B": B, "N": N, "V": V, "H": H, "W": W},
        "loop_iters": it,
        **{m: round(v, 2) for m, v in res.items()},
        "segment_sum_ms": round(seg_sum, 2),
        "dispatch_overhead_ms": round(
            res["full_fwd_dispatch_ms"] - res["full_fwd_device_ms"], 2
        ),
        "device_chunks_per_sec": round(B / (res["full_fwd_device_ms"] / 1e3), 2),
        "note": "per-segment times use 4-element D2H sync; device loop is "
        "lax.fori_loop chained through a scalar carry",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
