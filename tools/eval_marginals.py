"""Device-resident MARGINAL cost of each eval-forward stage.

The per-segment numbers in eval_profile.py are upper bounds (each segment
is its own jit + dispatch; XLA fuses/overlaps stages inside the real
forward: segments sum to 57 ms vs 28 ms fused). This measures the stages
CUMULATIVELY — rolled carry-chained loops of prefix pipelines — so
differences are true marginal device costs inside one jit:

  P0: prepare (lift) only
  P1: + 2D net
  P2: + fusion kNN
  P3: + neighbor gathers (group_points x2)
  P4: + aggregation MLP
  P5: + PN2SSG (= the full forward)

Round-5 fix (round-4 VERDICT weak #3): every stage's consumed arrays are
perturbed by the carry — round 4 only perturbed `points`, so the net2d
stage (which doesn't consume points) could be CSE'd/DCE'd across loop
iterations and its marginal read an implausible 0.07 ms while the
standalone segment measured 8.4 ms. Perturbing `images` as well forces the
2D net to actually run every iteration; `depth`/`poses` are perturbed too
so the lift inside prepare_batch can't be hoisted out of the loop either.

Run on the TPU host: python tools/eval_marginals.py
Writes runs/r5_eval_marginals.json.
"""
from __future__ import annotations

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
ITERS = 20


def main():
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

    def stage(level, state, b):
        m = nnx.merge(graphdef, state)
        mb = prepare_batch(cfg, b, training=False)
        if level == 0:
            return (
                jnp.sum(mb["image_xyz"][0, 0, 0, 0]) * 1e-6
                + jnp.sum(mb["images"][0, 0, 0, 0]) * 1e-6
            )
        images = mb["images"]
        feat2d, _ = m.net_2d(images.reshape(B * V, H, W, 3))
        if level == 1:
            return jnp.sum(feat2d[0, 0, 0].astype(jnp.float32)) * 1e-6
        pixel_feat = feat2d.reshape(B, V * H * W, -1)
        pixel_xyz = mb["image_xyz"].reshape(B, V * H * W, 3)
        _, idx = ops.knn(mb["points"], pixel_xyz, k)
        if level == 2:
            # consume feat2d too so the 2D net isn't dead at this level
            return (
                jnp.sum(idx[0, 0]).astype(jnp.float32) * 1e-6
                + jnp.sum(feat2d[0, 0, 0].astype(jnp.float32)) * 1e-6
            )
        gf = ops.group_points(pixel_feat, idx)
        gx = ops.group_points(pixel_xyz, idx)
        if level == 3:
            return (
                jnp.sum(gf[0, 0, 0].astype(jnp.float32)) * 1e-6
                + jnp.sum(gx[0, 0, 0]) * 1e-6
            )
        fused = m.aggregation(mb["points"], gx, gf)
        if level == 4:
            return jnp.sum(fused[0, 0].astype(jnp.float32)) * 1e-6
        logits = m.net_3d(mb["points"], fused)
        return jnp.sum(logits[0, 0]) * 1e-6

    out = {}
    prev = None
    names = [
        "prepare",
        "+net2d",
        "+fusion_knn",
        "+gathers",
        "+aggregation",
        "+net3d(full)",
    ]
    for level in range(6):
        def rolled(state, batch, iters, level=level):
            def body(i, carry):
                b = dict(batch)
                # perturb EVERY consumed input so no stage can be hoisted
                # out of the loop (see module docstring) — including the
                # lift's inputs (depth/poses), or prepare_batch's
                # unprojection is loop-invariant and XLA hoists it, the
                # exact artifact this tool exists to avoid.
                b["points"] = batch["points"] + carry * 1e-30
                b["images"] = batch["images"] + carry * 1e-30
                b["depth"] = batch["depth"] + carry * 1e-30
                b["poses"] = batch["poses"] + carry * 1e-30
                return stage(level, state, b)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(rolled, static_argnums=2)
        _ = np.asarray(fn(state, batch, ITERS))
        t0 = time.perf_counter()
        _ = np.asarray(fn(state, batch, ITERS))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        marg = ms - prev if prev is not None else ms
        out[names[level]] = {"cum_ms": round(ms, 2), "marginal_ms": round(marg, 2)}
        print(f"{names[level]:16s} cum {ms:6.2f}  marginal {marg:6.2f}", file=sys.stderr, flush=True)
        prev = ms

    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_eval_marginals.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
