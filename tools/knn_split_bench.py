"""Config-#4 kNN cost split: host-side prep (Morton argsort + gathers) vs
Pallas kernel time, on REALISTIC pixel clouds (scanline-ordered unprojected
depth with invalid-pixel sentinels — what the fusion path actually feeds),
plus the effect of skipping the ref-side sort entirely.

Round-2 VERDICT next #2: config #4 (102k queries x 1.23M refs) measured
288 ms vs a <100 ms target; this tool answers where the time goes.

Run on the TPU host: python tools/knn_split_bench.py
"""
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
from mvpnet_tpu.ops.pallas import knn as pknn, knn_bucketed as pgated


def _sync(out):
    """Force completion with a tiny D2H (axon block_until_ready lies, and a
    full np.asarray would bill multi-MB outputs to the ~38 MB/s tunnel)."""
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:4]), out)


def timed(name, f, *args, iters=5):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out, dt


def main():
    # config #4 shapes: whole-scene fusion, 64 views x 120x160 = 1.23M refs,
    # 102k query points
    scene = make_scene(0, num_points=102400, num_frames=64, height=120, width=160)
    xyz, valid = unproject_views(
        jnp.asarray(scene.depth.astype(np.float32)),
        jnp.asarray(scene.intrinsics.astype(np.float32)),
        jnp.asarray(scene.poses.astype(np.float32)),
    )
    refs = np.asarray(xyz).reshape(1, -1, 3)  # scanline order, sentinels kept
    q = scene.points[None].astype(np.float32)
    print(
        f"refs {refs.shape} valid {float(np.asarray(valid).mean()):.2f} "
        f"queries {q.shape}",
        flush=True,
    )
    qj, rj = jnp.asarray(q), jnp.asarray(refs)

    k = 3
    # grid-version gated path (round-2 production kernel)
    (d0, i0), t_full = timed(
        "gated grid      ",
        jax.jit(lambda a, b: pgated._knn_forward(a, b, k)),
        qj,
        rj,
    )

    # prep alone (sorts + gathers + tile bounds + lb argsort)
    tile_m, tile_n = pgated._TILE_M, pgated._TILE_N_BIG

    @jax.jit
    def prep(a, b):
        return pgated._prepare(a, b, tile_m, tile_n)

    _, t_prep = timed("prep alone      ", prep, qj, rj)

    # unsort/gather-back epilogue estimate = full - prep - kernel; get kernel
    # alone by running the forward on pre-sorted inputs with prep hoisted
    prepped = jax.tree.map(jnp.asarray, prep(qj, rj))

    def kernel_only(q_sorted, rT, order, lb):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B, M_pad, _ = q_sorted.shape
        nt = rT.shape[-1] // tile_n
        grid = (B, M_pad // tile_m, nt)
        kernel = functools.partial(
            pgated._gated_kernel, k=k, tile_n=tile_n, sub_gate=True
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_m, 3),
                    lambda b, im, t, order, lb: (b, im, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 3, tile_n),
                    lambda b, im, t, order, lb: (b, 0, order[b, im, t]),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tile_m, k),
                    lambda b, im, t, order, lb: (b, im, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tile_m, k),
                    lambda b, im, t, order, lb: (b, im, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_m, k), jnp.float32),
                pltpu.VMEM((tile_m, k), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, M_pad, k), jnp.float32),
                jax.ShapeDtypeStruct((B, M_pad, k), jnp.int32),
            ],
        )(order, lb, q_sorted, rT)

    q_sorted, r_sorted, q_order, r_order, order, lb_sorted, M_pad, N_pad = prepped
    rT = jnp.swapaxes(r_sorted, 1, 2)
    _, t_kernel = timed(
        "kernel alone    ", jax.jit(kernel_only), q_sorted, rT, order, lb_sorted
    )

    # demand-paged kernel (in-kernel while over lb-sorted tiles + DMA)
    (d2, i2), t_dem = timed(
        "gated demand    ",
        jax.jit(lambda a, b: pgated._knn_forward_demand(a, b, k)),
        qj,
        rj,
    )
    same_d = float(
        np.mean(np.sort(np.asarray(i2), -1) == np.sort(np.asarray(i0), -1))
    )
    print(f"demand vs grid parity: idx {same_d:.4f}")

    # natural-order refs (skip ref Morton sort; scanline coherence)
    (d1, i1), t_nat = timed(
        "gated natural   ",
        jax.jit(lambda a, b: pgated.knn(a, b, k, refs_coherent=True)),
        qj,
        rj,
    )
    same = float(
        np.mean(np.sort(np.asarray(i1), -1) == np.sort(np.asarray(i0), -1))
    )
    derr = float(np.abs(np.asarray(d1) - np.asarray(d0)).max())
    print(f"natural vs sorted parity: idx {same:.4f}, max d err {derr:.2e}")

    # brute baseline for reference
    _, t_brute = timed(
        "brute           ", jax.jit(lambda a, b: pknn.knn(a, b, k)), qj, rj, iters=2
    )

    print(
        f"\nsplit: grid={t_full:.0f} prep={t_prep:.0f} kernel={t_kernel:.0f} "
        f"demand={t_dem:.0f} natural={t_nat:.0f} brute={t_brute:.0f}",
        flush=True,
    )

    # fusion scale (train-path kernel): B4 x 8192 x 96k
    rng = np.random.default_rng(0)
    sc2 = make_scene(1, num_points=8192, num_frames=5, height=120, width=160)
    xyz2, _ = unproject_views(
        jnp.asarray(sc2.depth.astype(np.float32)),
        jnp.asarray(sc2.intrinsics.astype(np.float32)),
        jnp.asarray(sc2.poses.astype(np.float32)),
    )
    r2 = jnp.asarray(
        np.broadcast_to(np.asarray(xyz2).reshape(1, -1, 3), (4, 96000, 3)).copy()
    )
    q2 = jnp.asarray(
        np.stack([sc2.points[rng.integers(len(sc2.points), size=8192)] for _ in range(4)]).astype(
            np.float32
        )
    )
    (db, ib), t_fb = timed(
        "fusion brute    ", jax.jit(lambda a, b: pknn.knn(a, b, k)), q2, r2
    )
    (dd, idd), t_fd = timed(
        "fusion demand   ",
        jax.jit(lambda a, b: pgated._knn_forward_demand(a, b, k, sub_gate=False)),
        q2,
        r2,
    )
    same_f = float(
        np.mean(np.sort(np.asarray(idd), -1) == np.sort(np.asarray(ib), -1))
    )
    print(
        f"fusion: brute={t_fb:.1f} demand={t_fd:.1f} parity={same_f:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
