"""Round-5 fusion-kNN attack: visited-fraction simulation + small-TM sweep
+ rolled in-call marginals.

Three questions, one data setup (B4, 8192 queries x 96k scanline pixel refs):
  1. What fraction of (qtile, rtile) work does the demand kernel actually
     visit at each tile geometry (pure-jnp simulation from lb vs the final
     per-qtile worst k-th distance)? -> is the 8 ms kernel compute-bound,
     and how much would smaller query tiles prune?
  2. Does TM=16/32 beat the swept TM=64 floor (round-4 sweep stopped at 64)?
  3. Where do the ~8 non-kernel ms of the 16 ms fusion-kNN marginal go —
     rolled cumulative prefixes of the call's internal stages (morton,
     argsorts, gathers, bounds+rank, kernel, unmap), immune to dispatch
     overhead and CSE.

Run on the TPU host: python tools/r5_knn_gate_sim.py
Writes runs/r5_knn_gate_sim.json.
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
from jax.experimental import pallas as pl

from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.ops.pallas import knn_bucketed as pg

B, N, V, H, W, K = 4, 8192, 5, 120, 160, 3
ITERS = 20


def _sync(out):
    jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[:4]), out)


def timed(f, *args, iters=ITERS):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def make_data():
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
    return queries, refs


def simulate_visits(queries, refs, tile_m, tile_n, k=K):
    """Fraction of (qtile, rtile) pairs the while-loop visits: tiles with
    lb < the qtile's FINAL worst k-th distance, plus the one terminating
    probe. Ground-truth d from the (exact) Pallas kernel — the jnp
    reference would materialize an 11.7 GB distance matrix at this shape."""
    q_s, r_s, q_order, r_order, order, lb_sorted, M_pad, N_pad = jax.jit(
        lambda q, r: pg._prepare(q, r, tile_m, tile_n, sort_refs=True),
    )(queries, refs)
    d_true, _ = jax.jit(lambda q, r: pg.knn(q, r, k))(queries, refs)
    # worst k-th per SORTED qtile
    d_sorted = jnp.take_along_axis(d_true, q_order[..., None], axis=1)
    pad = M_pad - queries.shape[1]
    if pad:
        d_sorted = jnp.pad(d_sorted, ((0, 0), (0, pad), (0, 0)))
    worst = jnp.max(
        d_sorted[..., k - 1].reshape(B, M_pad // tile_m, tile_m), axis=-1
    )  # (B, Mt)
    visited = jnp.sum(lb_sorted < worst[..., None], axis=-1) + 1  # +1 terminating probe
    nt = int(N_pad) // tile_n
    frac = float(jnp.mean(visited / nt))
    # elementwise work relative to brute at the SAME geometry
    return frac, float(jnp.mean(visited)), nt


def main():
    queries, refs = make_data()
    res = {}

    # --- 1. visited-fraction simulation across geometries
    sims = {}
    for tm in (16, 32, 64, 128):
        for tn in (512, 1024, 2048):
            frac, mean_v, nt = simulate_visits(queries, refs, tm, tn)
            sims[f"tm{tm}_tn{tn}"] = {
                "visit_frac": round(frac, 4),
                "mean_visited_tiles": round(mean_v, 1),
                "n_tiles": nt,
            }
    res["visit_sim"] = sims
    print(json.dumps(sims, indent=2), file=sys.stderr, flush=True)

    # --- 2. demand-kernel sweep at small TM
    d0, i0 = jax.jit(lambda q, r: pg.knn(q, r, K))(queries, refs)
    sweep = {}
    for tm in (16, 32, 64):
        for tn in (1024, 2048):
            label = f"tm{tm}_tn{tn}"
            try:
                fn = jax.jit(
                    lambda q, r, tm=tm, tn=tn: pg._knn_forward_demand(
                        q, r, K, tile_m=tm, tile_n=tn, sub_gate=False
                    )
                )
                ms, (d, i) = timed(fn, queries, refs)
                ok = bool(
                    np.mean(
                        np.sort(np.asarray(i), -1) == np.sort(np.asarray(i0), -1)
                    )
                    > 0.9999
                )
                sweep[label] = {"ms": round(ms, 2), "parity": ok}
            except Exception as e:
                sweep[label] = {"error": str(e)[:200]}
            print(f"sweep {label}: {sweep[label]}", file=sys.stderr, flush=True)
    res["small_tm_sweep"] = sweep

    # --- 3. rolled in-call marginals of the production call (TM=64 TN=2048)
    TM, TN = 64, 2048

    def stage(level, q, r):
        qf = q.astype(jnp.float32)
        rf = r.astype(jnp.float32)
        lo = jnp.min(qf, axis=1, keepdims=True)
        hi = jnp.max(qf, axis=1, keepdims=True)
        code_q = pg._morton_code(qf, lo, hi)
        code_r = pg._morton_code(rf, lo, hi)
        if level == 0:
            return (jnp.sum(code_q[0, :1]) + jnp.sum(code_r[0, :1])).astype(
                jnp.float32
            ) * 1e-9
        q_order = jnp.argsort(code_q, axis=1).astype(jnp.int32)
        r_order = jnp.argsort(code_r, axis=1).astype(jnp.int32)
        if level == 1:
            return (jnp.sum(q_order[0, :1]) + jnp.sum(r_order[0, :1])).astype(
                jnp.float32
            ) * 1e-9
        q_sorted = jnp.take_along_axis(qf, q_order[..., None], axis=1)
        r_sorted = jnp.take_along_axis(rf, r_order[..., None], axis=1)
        if level == 2:
            return (jnp.sum(q_sorted[0, 0]) + jnp.sum(r_sorted[0, 0])) * 1e-9
        M_pad = pl.cdiv(N, TM) * TM
        N_pad = pl.cdiv(refs.shape[1], TN) * TN
        if M_pad > N:
            q_sorted = jnp.pad(
                q_sorted, ((0, 0), (0, M_pad - N), (0, 0)),
                constant_values=pg._PAD_COORD,
            )
        if N_pad > refs.shape[1]:
            r_sorted = jnp.pad(
                r_sorted, ((0, 0), (0, N_pad - refs.shape[1]), (0, 0)),
                constant_values=pg._PAD_COORD,
            )
        qlo, qhi = pg._tile_bounds(q_sorted, TM)
        rlo, rhi = pg._tile_bounds(r_sorted, TN)
        lb = pg._box_sqdist(qlo, qhi, rlo, rhi)
        order = jnp.argsort(lb, axis=-1).astype(jnp.int32)
        lb_sorted = jnp.take_along_axis(lb, order, axis=-1)
        if level == 3:
            return (jnp.sum(order[0, 0, :1]).astype(jnp.float32)) * 1e-9
        q4 = jnp.pad(q_sorted, ((0, 0), (0, 0), (0, 1)))
        rT4 = jnp.pad(jnp.swapaxes(r_sorted, 1, 2), ((0, 0), (0, 1), (0, 0)))
        d_s, i_s = pg._demand_call(
            q4, rT4, order, lb_sorted, k=K, tile_m=TM, tile_n=TN, sub_gate=False
        )
        if level == 4:
            return jnp.sum(d_s[0, 0]) * 1e-9
        d, i = pg._unmap(d_s, i_s, q_order, r_order, N, refs.shape[1])
        return (jnp.sum(i[0, 0]).astype(jnp.float32)) * 1e-9

    names = ["morton", "+argsorts", "+gathers", "+bounds_rank", "+kernel", "+unmap"]
    marg = {}
    prev = None
    for level in range(6):
        def rolled(q, r, iters, level=level):
            def body(it, carry):
                return stage(level, q + carry * 1e-30, r + carry * 1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(rolled, static_argnums=2)
        _ = np.asarray(fn(queries, refs, ITERS))
        t0 = time.perf_counter()
        _ = np.asarray(fn(queries, refs, ITERS))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        m = ms - prev if prev is not None else ms
        marg[names[level]] = {"cum_ms": round(ms, 2), "marginal_ms": round(m, 2)}
        print(f"{names[level]:14s} cum {ms:6.2f} marg {m:6.2f}", file=sys.stderr, flush=True)
        prev = ms
    res["call_marginals"] = marg

    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_knn_gate_sim.json", "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
