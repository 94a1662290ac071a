"""Device-resident MARGINAL cost of each train-step phase.

Same technique as tools/eval_marginals.py (cumulative rolled carry-chained
prefix pipelines, immune to dispatch overhead and DCE), at config-#2 train
shapes:

  T0: prepare (train mode: lift + augmentation)
  T1: + forward + loss
  T2: + backward (value_and_grad)
  T3: + optimizer update + metrics (= the full train step)

Run on the TPU host: python tools/train_marginals.py
Writes runs/r4_train_marginals.json.
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

B, N, V, H, W = 8, 8192, 3, 120, 160
ITERS = 10


def main():
    from __graft_entry__ import _example_batch
    from mvpnet_tpu.config import Config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import prepare_batch

    cfg = Config()
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    graphdef, st0 = nnx.split((model, optimizer))

    rng = np.random.default_rng(0)
    batch = jax.device_put(_example_batch(rng, B=B, N=N, V=V, H=H, W=W))
    key = jax.random.key(0)

    def stage(level, st, batch, k):
        m, opt = nnx.merge(graphdef, st)
        mb = prepare_batch(cfg, batch, training=True, rng_key=k)
        if level == 0:
            probe = jnp.sum(mb["image_xyz"][0, 0, 0, 0]) + jnp.sum(
                mb["points"][0, 0]
            )
            return st, probe * 1e-6
        if level == 1:
            out = m(mb)
            loss = loss_fn(out, mb)
            _, st_new = nnx.split((m, opt))
            return st_new, loss * 1e-6

        def compute_loss(mm):
            out = mm(mb)
            return loss_fn(out, mb), out

        (loss, out), grads = nnx.value_and_grad(compute_loss, has_aux=True)(m)
        if level == 2:
            gleaf = jax.tree.leaves(grads)[0]
            _, st_new = nnx.split((m, opt))
            return st_new, (loss + jnp.sum(gleaf)) * 1e-6
        opt.update(m, grads)
        mets = metric_fn(out, mb)
        probe = loss + mets["accuracy"] + jnp.sum(mets["confusion"]) * 1e-9
        _, st_new = nnx.split((m, opt))
        return st_new, probe * 1e-6

    names = ["prepare+augment", "+fwd+loss", "+bwd", "+optimizer(full)"]
    out = {}
    prev = None
    for level in range(4):
        def rolled(st, batch, key, iters, level=level):
            def body(i, carry):
                st, acc = carry
                b = dict(batch)
                b["points"] = batch["points"] + acc * 1e-30
                st, probe = stage(level, st, b, jax.random.fold_in(key, i))
                return st, probe

            return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))[1]

        fn = jax.jit(rolled, static_argnums=3)
        _ = np.asarray(fn(st0, batch, key, ITERS))
        t0 = time.perf_counter()
        _ = np.asarray(fn(st0, batch, key, ITERS))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        marg = ms - prev if prev is not None else ms
        out[names[level]] = {"cum_ms": round(ms, 2), "marginal_ms": round(marg, 2)}
        print(f"{names[level]:18s} cum {ms:7.2f}  marginal {marg:7.2f}", file=sys.stderr, flush=True)
        prev = ms

    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_train_marginals.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
