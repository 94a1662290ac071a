"""Per-kernel benchmark + speed-of-light accounting (SURVEY.md §5: "per-kernel
speed-of-light accounting for the Pallas kernels").

Run on a TPU host:  python tools/kernel_bench.py

For each hot op it reports pallas vs jnp-reference wall time and a
speed-of-light estimate from the op's arithmetic/memory footprint:
  * kNN/ball query: VPU elementwise ops (distance + selection passes)
  * FPS: sequential npoint sweeps over N
Timing syncs via a 4-element D2H (round-4 methodology: full np.asarray
bills MB-scale outputs to the ~38 MB/s tunnel; jax.block_until_ready can
return early on the axon platform).
"""
from __future__ import annotations

import json
import time

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.ops import reference as ref
from mvpnet_tpu.ops.pallas import (
    ballquery as pbq,
    fps as pfps,
    knn as pknn,
    knn_bucketed as pgated,
)

# rough v5e per-core vector throughput (f32 elementwise ops/s); used only to
# contextualize the SOL fraction, not as a hard claim
VPU_OPS = 0.9e12


def bench(f, *args, iters=10):
    def sync(o):
        jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), o)

    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    results = {}

    # --- kNN at fusion scale (B=4 chunks x 8192 pts x 96k pixels, k=3)
    B, M, N, K = 4, 8192, 96000, 3
    q = jnp.asarray(rng.uniform(-2, 2, (B, M, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    t_pal = bench(jax.jit(lambda q, r: pknn.knn(q, r, K)), q, r)
    ops_knn = B * M * N * (9 + 1 + 3 * 4)  # dist + rowmin + k merge passes
    results["knn_brute"] = {
        "shape": f"B{B} M{M} N{N} k{K}",
        "pallas_ms": round(t_pal * 1e3, 2),
        "reference_ms": None,  # jnp path OOMs at this scale (11.7GB dist)
        "sol_fraction": round(ops_knn / VPU_OPS / t_pal, 3),
    }

    # --- gated demand-paged kNN (the PRODUCTION kernel at this scale) —
    # it provably skips most of the brute work, so "sol_fraction" is
    # reported against the brute op count (values >1 = work skipped)
    t_gated = bench(jax.jit(lambda q, r: pgated.knn(q, r, K)), q, r)
    results["knn_gated"] = {
        "shape": f"B{B} M{M} N{N} k{K}",
        "pallas_ms": round(t_gated * 1e3, 2),
        "vs_brute": round(t_pal / t_gated, 2),
        "brute_sol_fraction": round(ops_knn / VPU_OPS / t_gated, 3),
    }

    # --- FPS at SA1 scale
    B, N, M = 8, 8192, 1024
    pts = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    t_ref = bench(jax.jit(lambda p: ref.farthest_point_sample(p, M)), pts)
    t_pal = bench(jax.jit(lambda p: pfps.farthest_point_sample(p, M)), pts)
    ops_fps = B * M * N * 14
    results["fps"] = {
        "shape": f"B{B} N{N} npoint{M}",
        "pallas_ms": round(t_pal * 1e3, 2),
        "reference_ms": round(t_ref * 1e3, 2),
        "speedup": round(t_ref / t_pal, 2),
        "sol_fraction": round(ops_fps / VPU_OPS / t_pal, 3),
    }

    # --- ball query at SA1 scale
    centers = pts[:, :1024]
    t_ref = bench(jax.jit(lambda c, p: ref.ball_query(c, p, 0.1, 32)), centers, pts)
    t_pal = bench(jax.jit(lambda c, p: pbq.ball_query(c, p, 0.1, 32)), centers, pts)
    ops_bq = 8 * 1024 * 8192 * (11 + 13 + 3 * 32)  # dist + scan + slot passes
    results["ball_query"] = {
        "shape": "B8 M1024 N8192 K32 r0.1",
        "pallas_ms": round(t_pal * 1e3, 2),
        "reference_ms": round(t_ref * 1e3, 2),
        "speedup": round(t_ref / t_pal, 2),
        "sol_fraction": round(ops_bq / VPU_OPS / t_pal, 3),
    }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
