"""Parameter sweep for the gated kNN kernel at config #4 scale.

Explores (tile_m, tile_n, sub_gate) against the round-1 defaults
(TM=256, TN=8192, sub_gate=True -> 288 ms) toward the <100 ms target
(round-1 VERDICT missing #6 / next #5). Run on the TPU host:
  python tools/knn_opt_sweep.py
"""
import functools
import time

import os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.ops.pallas import knn_bucketed as pgated


def timed(name, f, *args, iters=3):
    out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt, out


rng = np.random.default_rng(0)


def surface(n, b):
    planes = []
    per = n // 6
    for i in range(6):
        p = rng.uniform(-3, 3, (per, 3)).astype(np.float32)
        p[:, i % 3] = (-3 if i < 3 else 3) + rng.normal(0, 0.01, per)
        planes.append(p)
    rest = rng.uniform(-3, 3, (n - 6 * per, 3)).astype(np.float32)
    one = np.concatenate(planes + [rest])
    return np.stack([rng.permutation(one) for _ in range(b)])


def main():
    # config #4: 102k queries x 1.23M refs (64-view whole-scene fusion)
    q4 = jnp.asarray(rng.uniform(-3, 3, (1, 102400, 3)).astype(np.float32))
    r4 = jnp.asarray(surface(64 * 120 * 160, 1))

    def run(tm, tn, sg):
        return jax.jit(
            functools.partial(
                pgated._knn_forward, k=3, tile_m=tm, tile_n=tn, sub_gate=sg
            )
        )

    _, ref_out = timed("cfg4 default TM256 TN8192 sub", run(256, 8192, True), q4, r4)
    sweeps = [
        (256, 2048, False),
        (256, 4096, False),
        (256, 4096, True),
        (512, 4096, True),
        (256, 2048, True),
        (512, 2048, False),
        (128, 2048, False),
        (256, 16384, True),
    ]
    best = None
    for tm, tn, sg in sweeps:
        try:
            dt, out = timed(f"cfg4 TM{tm} TN{tn} sub={sg}", run(tm, tn, sg), q4, r4)
        except Exception as e:
            print(f"cfg4 TM{tm} TN{tn} sub={sg}: FAILED {type(e).__name__}: {e}")
            continue
        same = np.mean(
            np.sort(np.asarray(out[1]), -1) == np.sort(np.asarray(ref_out[1]), -1)
        )
        print(f"   parity vs default: {same:.6f}")
        if best is None or dt < best[0]:
            best = (dt, tm, tn, sg)
    print("BEST:", best)


if __name__ == "__main__":
    main()
