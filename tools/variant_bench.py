"""A/B measurements for kernel variants whose docstrings cite
docs/PERF_NOTES.md (round-2 VERDICT weak #5: claims must carry committed
numbers):

  * FPS batched (_fps_batched) vs per-row (_fps_perrow) at SA1 scale
  * ball query early_exit=True vs False at SA1 scale

Run on the TPU host: python tools/variant_bench.py
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

from mvpnet_tpu.ops.pallas import ballquery as pbq, fps as pfps


def bench(f, *args, iters=10):
    out = f(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {}

    # FPS at SA1 scale (B8 x 8192 -> 1024)
    B, N, M = 8, 8192, 1024
    pts = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    mask = jnp.zeros((B, N), jnp.float32)
    t_bat = bench(jax.jit(lambda p: pfps._fps_batched(p, M, mask)), pts)
    t_row = bench(jax.jit(lambda p: pfps._fps_perrow(p, M, mask)), pts)
    i_b = np.asarray(pfps._fps_batched(pts, M, mask))
    i_r = np.asarray(pfps._fps_perrow(pts, M, mask))
    out["fps_sa1"] = {
        "shape": f"B{B} N{N} npoint{M}",
        "batched_ms": round(t_bat, 2),
        "perrow_ms": round(t_row, 2),
        "speedup": round(t_row / t_bat, 2),
        "agree": bool((i_b == i_r).all()),
    }

    # ball query at SA1 scale (B8 M1024 N8192 K32 r0.1) + a fuller-ball case
    for name, radius in (("r0.1", 0.1), ("r0.4", 0.4)):
        centers = pts[:, :1024]
        t_on = bench(
            jax.jit(lambda c, p: pbq.ball_query(c, p, radius, 32)), centers, pts
        )
        t_off = bench(
            jax.jit(
                lambda c, p: pbq.ball_query(c, p, radius, 32, early_exit=False)
            ),
            centers,
            pts,
        )
        a = jax.tree.map(np.asarray, pbq.ball_query(centers, pts, radius, 32))
        b = jax.tree.map(
            np.asarray, pbq.ball_query(centers, pts, radius, 32, early_exit=False)
        )
        out[f"ball_query_sa1_{name}"] = {
            "shape": f"B8 M1024 N8192 K32 {name}",
            "early_exit_ms": round(t_on, 2),
            "no_exit_ms": round(t_off, 2),
            "speedup": round(t_off / t_on, 2),
            "agree": bool((a[0] == b[0]).all() and (a[1] == b[1]).all()),
        }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
