"""Tile-size sweep for the gated kNN at config-#4 scale (kernel grid
overhead vs skip granularity). Run on the TPU host."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.ops.pallas import knn_bucketed as pgated


def sync(out):
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:4]), out)


def timed(f, *args, iters=5):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    scene = make_scene(0, num_points=102400, num_frames=64, height=120, width=160)
    xyz, _ = unproject_views(
        jnp.asarray(scene.depth.astype(np.float32)),
        jnp.asarray(scene.intrinsics.astype(np.float32)),
        jnp.asarray(scene.poses.astype(np.float32)),
    )
    r = jnp.asarray(np.asarray(xyz).reshape(1, -1, 3))
    q = jnp.asarray(scene.points[None].astype(np.float32))
    k = 3

    d0 = i0 = None
    import itertools
    for tile_m, tile_n in itertools.product((128, 256), (2048, 4096, 8192)):
            f = jax.jit(
                lambda a, b, tm=tile_m, tn=tile_n: pgated._knn_forward_demand(
                    a, b, k, tile_m=tm, tile_n=tn, sub_gate=True
                )
            )
            try:
                t = timed(f, q, r)
            except Exception as e:
                print(f"TM={tile_m} TN={tile_n}: FAIL {type(e).__name__}", flush=True)
                continue
            d, i = f(q, r)
            if d0 is None:
                d0, i0 = np.sort(np.asarray(d), -1), np.sort(np.asarray(i), -1)
                ok = True
            else:
                ok = bool(
                    (np.sort(np.asarray(i), -1) == i0).all()
                    and np.allclose(np.sort(np.asarray(d), -1), d0, atol=1e-5)
                )
            print(f"TM={tile_m} TN={tile_n}: {t:.1f} ms  parity={ok}", flush=True)


if __name__ == "__main__":
    main()
