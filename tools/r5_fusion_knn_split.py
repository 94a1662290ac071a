"""Fusion-scale kNN cost split: prep stages vs kernel (round-5 item 1).

The fusion kNN stage is ~71% of the eval forward (runs/r4_eval_marginals.json:
kNN+gather+agg marginal 20.2 ms of 28.3). The demand kernel's tile geometry is
already swept (runs/r4_fusion_knn_sweep.json: 14.2 ms best); what is NOT known
is how much of that is jnp prep (Morton sorts, ref gather, tile bounds, visit
ranking) vs the Pallas kernel itself — at config-#4 scale prep was ~60 of
124 ms, so the same split at fusion scale decides whether round 5 attacks the
kernel or the prep.

Run on the TPU host: python tools/r5_fusion_knn_split.py
Writes runs/r5_fusion_knn_split.json.
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

from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.ops.pallas import knn_bucketed as pg

B, N, V, H, W, K = 4, 8192, 5, 120, 160, 3
TM, TN = 64, 2048  # measured-best fusion geometry


def _sync(out):
    jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), out)


def timed(f, *args, iters=20):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    rng = np.random.default_rng(0)
    scene = make_scene(1, num_points=20000, num_frames=V, height=H, width=W)
    xyz, _ = unproject_views(
        jnp.asarray(scene.depth.astype(np.float32)),
        jnp.asarray(scene.intrinsics.astype(np.float32)),
        jnp.asarray(scene.poses.astype(np.float32)),
    )
    refs = jnp.asarray(
        np.broadcast_to(np.asarray(xyz).reshape(1, -1, 3), (B, V * H * W, 3)).copy()
    )
    queries = jnp.asarray(
        np.stack(
            [scene.points[rng.integers(len(scene.points), size=N)] for _ in range(B)]
        ).astype(np.float32)
    )
    res = {}

    # full call (reference point)
    full_ms, _ = timed(
        jax.jit(lambda q, r: pg._knn_forward_demand(q, r, K, tile_m=TM, tile_n=TN)),
        queries, refs,
    )
    res["full_call_ms"] = round(full_ms, 2)

    # prep stages, each its own jit (upper bounds on marginal cost)
    def morton_q(q):
        lo = jnp.min(q, axis=1, keepdims=True)
        hi = jnp.max(q, axis=1, keepdims=True)
        return pg._morton_code(q, lo, hi)

    ms, codes_q = timed(jax.jit(morton_q), queries)
    res["morton_code_q_ms"] = round(ms, 2)

    def morton_r(q, r):
        lo = jnp.min(q, axis=1, keepdims=True)
        hi = jnp.max(q, axis=1, keepdims=True)
        return pg._morton_code(r, lo, hi)

    ms, codes_r = timed(jax.jit(morton_r), queries, refs)
    res["morton_code_r_ms"] = round(ms, 2)

    ms, order_q = timed(jax.jit(lambda c: jnp.argsort(c, axis=1)), codes_q)
    res["argsort_q_8k_ms"] = round(ms, 2)
    ms, order_r = timed(jax.jit(lambda c: jnp.argsort(c, axis=1)), codes_r)
    res["argsort_r_96k_ms"] = round(ms, 2)

    ms, _ = timed(
        jax.jit(
            lambda r, o: jnp.take_along_axis(r, o[..., None].astype(jnp.int32), axis=1)
        ),
        refs, order_r,
    )
    res["gather_r_96k_ms"] = round(ms, 2)

    # tile bounds + (Mt, Nt) lb + rank
    def bounds_rank(qs, rs):
        qlo, qhi = pg._tile_bounds(qs, TM)
        rlo, rhi = pg._tile_bounds(rs, TN)
        lb = pg._box_sqdist(qlo, qhi, rlo, rhi)
        order = jnp.argsort(lb, axis=-1).astype(jnp.int32)
        return order, jnp.take_along_axis(lb, order, axis=-1)

    prep = jax.jit(
        lambda q, r: pg._prepare(q, r, TM, TN, sort_refs=True),
        static_argnums=(),
    )
    q_s, r_s, q_o, r_o, order, lb_s, M_pad, N_pad = prep(queries, refs)
    ms, _ = timed(jax.jit(bounds_rank), q_s, r_s)
    res["bounds_rank_ms"] = round(ms, 2)

    # whole prep fused
    ms, _ = timed(prep, queries, refs)
    res["prep_total_ms"] = round(ms, 2)

    # kernel only, on pre-prepped operands
    q4 = jnp.pad(q_s, ((0, 0), (0, 0), (0, 1)))
    rT4 = jnp.pad(jnp.swapaxes(r_s, 1, 2), ((0, 0), (0, 1), (0, 0)))
    kern = jax.jit(
        lambda a, b, c, d: pg._demand_call(
            a, b, c, d, k=K, tile_m=TM, tile_n=TN, sub_gate=False
        )
    )
    ms, (d_s, i_s) = timed(kern, q4, rT4, order, lb_s)
    res["kernel_only_ms"] = round(ms, 2)

    # unmap (ref-index gather + query unsort)
    ms, _ = timed(
        jax.jit(lambda a, b, c, d: pg._unmap(a, b, c, d, N, refs.shape[1])),
        d_s, i_s, q_o, r_o,
    )
    res["unmap_ms"] = round(ms, 2)

    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_fusion_knn_split.json", "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
