"""Bench the VMEM-resident gated kNN kernel at fusion scale (round 5).

The visit-count simulation (runs/r5_knn_gate_sim.json) showed per-visit DMA
machinery (~1.2 us) and program launches dominate the demand-paged kernel at
96k refs, where the whole sorted cloud fits VMEM. This sweeps the
_vmem_kernel tile geometry against the demand kernel at the measured-best
geometry, full-call times (prep + kernel + unmap, one jit).

Run on the TPU host: python tools/r5_vmem_knn_bench.py
Writes runs/r5_vmem_knn_bench.json.
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
    base_ms, (d0, i0) = timed(
        jax.jit(
            lambda q, r: pg._knn_forward_demand(
                q, r, K, tile_m=64, tile_n=2048, use_vmem=False
            )
        ),
        queries, refs,
    )
    res["demand_tm64_tn2048_ms"] = round(base_ms, 2)
    print(f"demand baseline: {base_ms:.2f} ms", file=sys.stderr, flush=True)

    best = ("demand", base_ms)
    for tm in (16, 32, 64, 128):
        for tn in (512, 1024, 2048):
            label = f"vmem_tm{tm}_tn{tn}"
            try:
                fn = jax.jit(
                    lambda q, r, tm=tm, tn=tn: pg._knn_forward_demand(
                        q, r, K, tile_m=tm, tile_n=tn, use_vmem=True
                    )
                )
                ms, (d, i) = timed(fn, queries, refs)
                ok = bool(
                    np.mean(
                        np.sort(np.asarray(i), -1) == np.sort(np.asarray(i0), -1)
                    )
                    > 0.9999
                )
                res[label] = {"ms": round(ms, 2), "parity": ok}
                if ok and ms < best[1]:
                    best = (label, ms)
            except Exception as e:
                res[label] = {"error": str(e)[:300]}
            print(f"{label}: {res[label]}", file=sys.stderr, flush=True)
    res["best"] = {"label": best[0], "ms": round(best[1], 2)}

    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_vmem_knn_bench.json", "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
