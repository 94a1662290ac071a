"""Demand-kernel geometry sweep at FUSION scale (B4 8192 x 96k).

The fusion kNN is now the largest single segment of the eval forward
(~22 ms of 28.2 — runs/r4_eval_profile.json). The demand kernel's tile
geometry was swept at config-#4 scale only (round 3); this sweeps
(tile_m, tile_n, sub_gate) at the shape every train step and eval chunk
actually runs, on realistic scanline pixel clouds.

Run on the TPU host: python tools/knn_fusion_sweep.py
Writes runs/r4_fusion_knn_sweep.json.
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
from mvpnet_tpu.ops.pallas import knn_bucketed as pgated

B, N, V, H, W, K = 4, 8192, 5, 120, 160, 3


def _sync(out):
    jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), out)


def timed(f, *args, iters=10):
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

    base_ms, (d0, i0) = timed(
        jax.jit(lambda q, r: pgated.knn(q, r, K)), queries, refs
    )
    print(f"default dispatch: {base_ms:.2f} ms", file=sys.stderr, flush=True)

    results = {"default_ms": round(base_ms, 2)}
    best = ("default", base_ms)
    for tm in (64, 128, 256):
        for tn in (1024, 2048, 4096):
            for sg in (False, True):
                label = f"tm{tm}_tn{tn}_{'sub' if sg else 'full'}"
                try:
                    fn = jax.jit(
                        lambda q, r, tm=tm, tn=tn, sg=sg: pgated._knn_forward_demand(
                            q, r, K, tile_m=tm, tile_n=tn, sub_gate=sg
                        )
                    )
                    ms, (d, i) = timed(fn, queries, refs)
                    ok = bool(
                        np.mean(
                            np.sort(np.asarray(i), -1) == np.sort(np.asarray(i0), -1)
                        )
                        > 0.9999
                    )
                    results[label] = {"ms": round(ms, 2), "parity": ok}
                    print(f"{label}: {ms:.2f} ms parity={ok}", file=sys.stderr, flush=True)
                    if ok and ms < best[1]:
                        best = (label, ms)
                except Exception as e:
                    results[label] = {"error": str(e)[:200]}
                    print(f"{label}: FAIL {str(e)[:120]}", file=sys.stderr, flush=True)
    results["best"] = {"label": best[0], "ms": round(best[1], 2)}
    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_fusion_knn_sweep.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
