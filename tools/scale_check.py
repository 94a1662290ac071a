"""TPU scale check for the large BASELINE configs (#3 32k chunks, #4 64-view
high-res): compiles + times the hot ops and the fusion forward at scale.

Run on a TPU host:  python tools/scale_check.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.ops.pallas import ballquery as pbq, fps as pfps, knn as pknn


def timed(name, f, *args, iters=3):
    out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.1f} ms")


def main():
    rng = np.random.default_rng(0)

    print("== config #3: 32k-pt chunks ==")
    pts = jnp.asarray(rng.uniform(-3, 3, (4, 32768, 3)).astype(np.float32))
    timed("fps 32k->4096 (B4)", jax.jit(lambda p: pfps.farthest_point_sample(p, 4096)), pts)
    centers = pts[:, :4096]
    timed("ball query 4096x32k K32 (B4)", jax.jit(lambda c, p: pbq.ball_query(c, p, 0.1, 32)), centers, pts)

    print("== config #4: 64 views, 100k+ pts ==")
    # fusion kNN: 102400 points x 64 views of 120x160 = 1.23M pixel refs
    q = jnp.asarray(rng.uniform(-3, 3, (1, 102400, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-3, 3, (1, 64 * 120 * 160, 3)).astype(np.float32))
    timed("fusion knn 102k x 1.23M k3", jax.jit(lambda q, r: pknn.knn(q, r, 3)), q, r)
    timed("fps 102k->8192", jax.jit(lambda p: pfps.farthest_point_sample(p, 8192)), q)


if __name__ == "__main__":
    main()
