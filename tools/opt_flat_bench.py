"""On-chip A/B of the flattened optimizer update (solver.flatten_update).

PERF_NOTES round 3 measured the optimizer's marginal cost inside the fused
train step at ~28 ms for 22M params (~7 GB/s effective) and named the
flatten-params update as the candidate fix. This measures, at config-#2
train shapes (B8 N8192 V3 120x160):

  * optimizer.update STANDALONE (params+grads resident), flattened vs not;
  * the full device-resident train step (rolled fori_loop x ITERS),
    flattened vs not.

Run on the TPU host: python tools/opt_flat_bench.py
Writes runs/r4_opt_flat.json.
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
import jax.numpy as jnp
from flax import nnx

B, N, V, H, W = 8, 8192, 3, 120, 160
ITERS = 10


def measure(cfg, batch, label):
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import prepare_batch

    model, loss_fn, _ = build_model(cfg, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    graphdef, st0 = nnx.split((model, optimizer))
    key = jax.random.key(0)

    def one_step(st, batch, key):
        m, opt = nnx.merge(graphdef, st)
        mb = prepare_batch(cfg, batch, training=True, rng_key=key)

        def compute_loss(mm):
            return loss_fn(mm(mb), mb)

        loss, grads = nnx.value_and_grad(compute_loss)(m)
        opt.update(m, grads)
        _, st_new = nnx.split((m, opt))
        return st_new, loss, grads

    # standalone update: fixed grads, loop the update only
    def upd_loop(st, grads, iters):
        def body(i, carry):
            st, _ = carry
            m, opt = nnx.merge(graphdef, st)
            g = jax.tree.map(lambda x: x + i * 0e0, grads)
            opt.update(m, g)
            _, st_new = nnx.split((m, opt))
            return st_new, jnp.float32(i)

        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))[1]

    def step_loop(st, batch, key, iters):
        def body(i, carry):
            st, _ = carry
            st, loss, _ = one_step(st, batch, jax.random.fold_in(key, i))
            return st, loss

        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))[1]

    grads = jax.jit(lambda st, b, k: one_step(st, b, k)[2])(st0, batch, key)

    out = {}
    for name, fn, args in (
        ("update_ms", jax.jit(upd_loop, static_argnums=2), (st0, grads, ITERS)),
        ("step_ms", jax.jit(step_loop, static_argnums=3), (st0, batch, key, ITERS)),
    ):
        _ = np.asarray(fn(*args))  # compile
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        out[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
        print(f"{label} {name}: {out[name]} ms", file=sys.stderr, flush=True)
    return out


def main():
    from __graft_entry__ import _example_batch
    from mvpnet_tpu.config import Config

    rng = np.random.default_rng(0)
    batch = jax.device_put(_example_batch(rng, B=B, N=N, V=V, H=H, W=W))

    res = {}
    for flat in (False, True):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, flatten_update=flat)
        )
        res["flat" if flat else "per_tensor"] = measure(
            cfg, batch, "flat" if flat else "per-tensor"
        )

    out = {
        "shape": {"B": B, "N": N, "V": V, "H": H, "W": W},
        "iters": ITERS,
        **res,
        "note": "rolled fori_loop, device-resident; update loop uses fixed "
        "grads so only the optimizer math repeats",
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_opt_flat.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
