"""On-chip A/B of the PRODUCTION fusion-kNN configuration.

Round-3 VERDICT weak #2: models/fusion.py shipped ``refs_coherent=True``
(skip ref Morton sort) while PERF_NOTES' headline was measured with sorted
refs. This tool measures exactly the call the model makes — ``ops.knn``
dispatch at B4 8192x96k fusion shapes on realistic scanline pixel clouds —
in both configurations, and records the winner to runs/r4_fusion_knn_ab.json.

Run on the TPU host: python tools/fusion_knn_ab.py
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

from mvpnet_tpu import ops
from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.data.synthetic import make_scene

B, N, V, H, W, K = 4, 8192, 5, 120, 160, 3


def _sync(out):
    # axon block_until_ready can return early; a tiny D2H forces completion
    # without billing MB-scale outputs to the ~38 MB/s tunnel
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:4]), out)


def timed(name, f, *args, iters=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out, dt


def main():
    rng = np.random.default_rng(0)
    scene = make_scene(1, num_points=20000, num_frames=V, height=H, width=W)
    xyz, valid = unproject_views(
        jnp.asarray(scene.depth.astype(np.float32)),
        jnp.asarray(scene.intrinsics.astype(np.float32)),
        jnp.asarray(scene.poses.astype(np.float32)),
    )
    pixel_xyz = jnp.asarray(
        np.broadcast_to(
            np.asarray(xyz).reshape(1, -1, 3), (B, V * H * W, 3)
        ).copy()
    )
    points = jnp.asarray(
        np.stack(
            [
                scene.points[rng.integers(len(scene.points), size=N)]
                for _ in range(B)
            ]
        ).astype(np.float32)
    )
    print(
        f"queries {points.shape} refs {pixel_xyz.shape} "
        f"valid {float(np.asarray(valid).mean()):.2f}",
        flush=True,
    )

    (ds, i_sorted), t_sorted = timed(
        "ops.knn sorted (refs_coherent=False)",
        jax.jit(lambda q, r: ops.knn(q, r, K)),
        points,
        pixel_xyz,
    )
    (dn, i_nat), t_natural = timed(
        "ops.knn natural (refs_coherent=True) ",
        jax.jit(lambda q, r: ops.knn(q, r, K, refs_coherent=True)),
        points,
        pixel_xyz,
    )
    parity = float(
        np.mean(
            np.sort(np.asarray(i_sorted), -1) == np.sort(np.asarray(i_nat), -1)
        )
    )
    print(f"sorted-vs-natural parity: {parity:.4f}", flush=True)

    result = {
        "shape": {"B": B, "N": N, "V": V, "H": H, "W": W, "k": K},
        "sorted_ms": round(t_sorted, 2),
        "natural_ms": round(t_natural, 2),
        "parity": parity,
        "production_config": "sorted (refs_coherent removed from models/fusion.py, round 4)",
        "note": "per-call 4-element D2H sync; tunnel-dispatched jit calls",
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/r4_fusion_knn_ab.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
