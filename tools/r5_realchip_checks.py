"""Real-chip verification bundle (round 5): claims in STATUS.md that were
first established ad hoc, re-runnable as one command with a committed
artifact.

  1. prepared-kNN gradients at fusion scale on the REAL TPU: the custom VJP
     (queries + sorted-space ref cotangents through prepare_refs) must match
     the brute kernel's analytic VJP.
  2. single-chip graft entry forward: shape/dtype/finiteness.

Run on the TPU host: python tools/r5_realchip_checks.py
Writes runs/r5_realchip_checks.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mvpnet_tpu.ops.pallas import knn as pknn
    from mvpnet_tpu.ops.pallas import knn_bucketed as pg

    res = {"backend": jax.default_backend(), "devices": str(jax.devices())}

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (2, 8192, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-2, 2, (2, 96000, 3)).astype(np.float32))

    def loss_prep(q, r):
        prepared = pg.prepare_refs(r)
        d, _ = pg.knn_prepared(q, prepared, 3)
        return jnp.sum(jnp.sin(d))

    def loss_brute(q, r):
        d, _ = pknn.knn(q, r, 3)
        return jnp.sum(jnp.sin(d))

    gq, gr = jax.jit(jax.grad(loss_prep, argnums=(0, 1)))(q, r)
    gq2, gr2 = jax.jit(jax.grad(loss_brute, argnums=(0, 1)))(q, r)
    gq, gr, gq2, gr2 = map(np.asarray, (gq, gr, gq2, gr2))
    res["prepared_vjp_fusion_scale"] = {
        "finite": bool(np.isfinite(gq).all() and np.isfinite(gr).all()),
        "query_grads_match_brute_vjp": bool(np.allclose(gq, gq2, atol=1e-4)),
        "ref_grads_match_brute_vjp": bool(np.allclose(gr, gr2, atol=1e-4)),
        "max_query_grad_delta": float(np.abs(gq - gq2).max()),
        "max_ref_grad_delta": float(np.abs(gr - gr2).max()),
    }

    import __graft_entry__ as g

    fn, (state, batch) = g.entry()
    out = np.asarray(jax.jit(fn)(state, batch)[:1, :8])
    res["graft_entry_forward"] = {
        "out_slice_finite": bool(np.isfinite(out).all()),
    }

    res["ok"] = bool(
        res["prepared_vjp_fusion_scale"]["query_grads_match_brute_vjp"]
        and res["prepared_vjp_fusion_scale"]["ref_grads_match_brute_vjp"]
        and res["graft_entry_forward"]["out_slice_finite"]
    )
    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_realchip_checks.json", "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
