"""Close the gap between full_grad (~74 ms) and the real train step
(~328 ms) at config-#2 shapes: time the step with pieces toggled.

Run on the TPU host: python tools/step_gap.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from flax import nnx


def timed(f, *args, iters=10):
    out = f(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree.map(np.asarray, out)
    return round((time.perf_counter() - t0) / iters * 1e3, 2)


def main():
    import dataclasses

    from mvpnet_tpu.config import Config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step, prepare_batch
    from __graft_entry__ import _example_batch

    out = {}
    cfg = Config()
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        _example_batch(
            rng,
            B=8,
            N=cfg.data.num_points,
            V=cfg.data.num_views_train,
            H=cfg.data.image_height,
            W=cfg.data.image_width,
        )
    )
    key = jax.random.key(0)

    def build(cfg):
        model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
        opt = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
        return model, opt, make_train_step(cfg, loss_fn, metric_fn)

    # full step as configured (donate on)
    model, opt, step = build(cfg)
    out["full_step_ms"] = timed(lambda: step(model, opt, batch, key))

    # donate off
    cfg_nod = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, donate=False)
    )
    model, opt, step = build(cfg_nod)
    out["no_donate_ms"] = timed(lambda: step(model, opt, batch, key))

    # augmentation off (isolates augment_chunk inside prepare)
    cfg_noaug = dataclasses.replace(
        cfg_nod, data=dataclasses.replace(cfg.data, augment=False)
    )
    model, opt, step = build(cfg_noaug)
    out["no_augment_ms"] = timed(lambda: step(model, opt, batch, key))

    # grad-only (no optimizer update, no metrics), same prepare path
    model, loss_fn, metric_fn = build_model(cfg_nod, rngs=nnx.Rngs(0))

    @nnx.jit
    def grad_only(model, batch, key):
        mb = prepare_batch(cfg_nod, batch, training=True, rng_key=key)

        def loss(m):
            return loss_fn(m(mb), mb)

        return nnx.value_and_grad(loss)(model)[0]

    out["grad_only_ms"] = timed(lambda: grad_only(model, batch, key))

    # optimizer-only: apply fixed grads
    opt = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    grads = nnx.state(model, nnx.Param)

    @nnx.jit
    def opt_only(model, opt, grads):
        opt.update(model, grads)
        return 0

    out["opt_only_ms"] = timed(lambda: opt_only(model, opt, grads))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
