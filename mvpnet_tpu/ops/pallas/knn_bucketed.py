"""Morton-sorted, bound-gated exact kNN Pallas kernel.

Production path for LARGE reference clouds — the 2D-3D fusion kNN
(8192 chunk points x V*H*W unprojected pixels; reference semantics:
mvpnet/data/scannet_2d3d.py CPU KDTree, UNVERIFIED; SURVEY.md §3.4) — where
the plain tiled kernel (ops/pallas/knn.py) pays full |Q|x|R| VPU cost.

Design (exact — same arithmetic as the brute kernel, just skips work it can
prove useless):
  1. Sort queries and refs by 30-bit Morton code (cheap jnp prep) so
     consecutive slabs are spatially compact.
  2. Per query tile, visit ref tiles in ascending box-box-lower-bound order
     (a per-tile permutation rides scalar prefetch and drives the ref
     BlockSpec index_map). Nearest tiles come first, so the running k-th
     best distance tightens immediately.
  3. PROGRAM-LEVEL GATE: the precomputed lb(qtile, rtile) values also ride
     scalar prefetch (in visit order); each program compares its tile's lb
     against the query tile's worst running k-th distance with ONE scalar
     branch and skips the whole tile's work when it cannot improve any row.
     Because visit order is ascending-lb and the worst bound only shrinks,
     after the first miss every remaining tile is skipped at branch cost.
  4. For very large ref clouds (N >= _BIG_N, TN=8192 tiles) the surviving
     tiles additionally split the query tile into 8-row SUBGROUPS, each
     gated on its own exact in-kernel AABB bound — finer skips, amortized
     by the big tile (32 branches/program are a net loss at TN=2048;
     docs/PERF_NOTES.md).
  5. Results are mapped back through the two sort permutations.

Why not other designs (all measured on v5e, B4 8192x96k surface clouds —
see git history / PERF_NOTES):
  * MXU scoring (|r|^2-2qr): HIGHEST-precision dot is slower than the 9-op
    VPU form at contraction depth 3; DEFAULT (bf16) corrupts ~48% of
    neighbor sets. Mosaic rejects HIGH.
  * Candidate-tile pruning with static top-T lists: box bounds on surface
    clouds pass 40-80% of tiles (Morton tiles of wall/floor scans have
    huge overlapping AABBs) — the adaptive running bound here is the only
    bound tight enough to prune.
  * XLA gather-based window search: ~36ns/element random gather on TPU
    makes any gather-per-candidate scheme 10-40x slower than brute force.

Exactness: the skip condition lb(g,t) >= worst_k(g) can only discard tiles
that cannot improve any row of the subgroup, so results equal the brute
kernel everywhere except the index CHOICE between exactly-equal distances
(ties follow the lb-sorted visit order instead of lowest-original-index;
measure-zero for continuous inputs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvpnet_tpu.ops.pallas.knn import _knn_bwd, _merge_candidate

_TILE_M = 256
_TILE_N = 2048
_TILE_N_BIG = 8192  # larger ref tiles amortize the per-program branch cost
_BIG_N = 1 << 18
# demand-paged kernel tile geometry at big N: with per-(qtile,rtile) launch
# and DMA overhead gone, smaller tiles win (round-3 sweep: 104.8 ms at
# config #4 vs 114.7 with the grid geometry; docs/PERF_NOTES.md)
_DEMAND_TILE_M = 128
_DEMAND_TILE_N_BIG = 4096
# ...and at FUSION scale (96k refs) even smaller query tiles win: TM=64
# measured 14.2 vs 15.6 ms at TM=256 (round-4 sweep,
# runs/r4_fusion_knn_sweep.json) — narrower tiles tighten the running
# worst-k bound faster, so the while_loop exits earlier
_DEMAND_TILE_M_SMALL = 64
_SUB = 8  # rows per gated subgroup (one f32 sublane)
_MAX_K = 8
# ref padding sentinel: beyond the 1e9 masked-ref sentinel so padding never
# outranks a masked-but-real ref; (3e9)^2*3 < f32 max
_PAD_COORD = 3e9


_MIN_N = 1 << 15  # below this the sorting prep is a wash vs the brute kernel
# coords at/above this magnitude are sentinels (invalid-pixel fill 1e6,
# masked-ref 1e9, tile pad 3e9) and are excluded from AABB bounds — they
# remain in the distance pass (just far away), so results are unchanged
_SENTINEL_MIN = 1e5


def supported(queries, refs, k: int) -> bool:
    return (
        queries.ndim == 3
        and refs.ndim == 3
        and queries.shape[-1] == 3
        and refs.shape[-1] == 3
        and 1 <= k <= _MAX_K
        and refs.shape[1] >= k
        and refs.shape[1] >= _MIN_N
        and queries.shape[1] >= _TILE_M
    )


def _morton_code(xyz, lo, hi):
    """30-bit Morton code from 10 bits/dim; xyz (..., 3), lo/hi (..., 1, 3)."""
    scale = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((xyz - lo) / scale, 0.0, 1.0 - 1e-7)
    cell = (q * 1024.0).astype(jnp.int32)  # (..., 3) in [0, 1023]

    def spread(v):  # interleave: 10 bits -> every 3rd bit
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    x, y, z = cell[..., 0], cell[..., 1], cell[..., 2]
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _tile_bounds(sorted_xyz, tile):
    """(B, N, 3) -> per-tile AABB (B, N//tile, 3) lo / hi over REAL points.

    Sentinel coords (invalid pixels / padding) are excluded so a tile's box
    reflects its real geometry; an all-sentinel tile gets (+inf, -inf)
    bounds -> infinite lower bound -> visited last and skipped."""
    B, N, _ = sorted_xyz.shape
    t = sorted_xyz.reshape(B, N // tile, tile, 3)
    real = jnp.all(jnp.abs(t) < _SENTINEL_MIN, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(real, t, jnp.inf), axis=2)
    hi = jnp.max(jnp.where(real, t, -jnp.inf), axis=2)
    return lo, hi


def _box_sqdist(alo, ahi, blo, bhi):
    """Min squared distance between AABB sets: (B,Mt,3) x (B,Nt,3) -> (B,Mt,Nt)."""
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            alo[:, :, None, :] - bhi[:, None, :, :],
            blo[:, None, :, :] - ahi[:, :, None, :],
        ),
    )
    return jnp.sum(gap * gap, axis=-1)


def _gated_kernel(
    order_ref, lb_ref, q_ref, r_ref, d_out, i_out, best_d, best_i, *, k, tile_n, sub_gate
):
    t = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    b = pl.program_id(0)
    im = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        best_d[:] = jnp.full(best_d.shape, jnp.inf, jnp.float32)
        best_i[:] = jnp.zeros(best_i.shape, jnp.int32)

    # PROGRAM-LEVEL GATE (one scalar branch): skip the whole tile when its
    # precomputed AABB lower bound cannot beat the query tile's worst running
    # k-th distance. Visit order is ascending-lb and `worst` only shrinks, so
    # in steady state every remaining tile is skipped at branch cost — this is
    # what makes gating pay at 96k refs, where 32 subgroup branches/program
    # ate the entire compute skip (docs/PERF_NOTES.md).
    worst_all = jnp.max(best_d[:, k - 1])  # inf right after init
    tile_lb = lb_ref[b, im, t]

    @pl.when((t == 0) | (tile_lb < worst_all))
    def _tile_body():
        q = q_ref[0]  # (TM, 3)
        r = r_ref[0]  # (3, TN)
        tile_id = order_ref[b, im, t]
        tm = q.shape[0]

        if not sub_gate:
            # full-tile brute body (fusion scale): distances + k-pass extract
            dx = q[:, 0:1] - r[0:1, :]
            dy = q[:, 1:2] - r[1:2, :]
            dz = q[:, 2:3] - r[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz  # (TM, TN)
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            row_min = jnp.min(d2, axis=1)
            improves = jnp.any(row_min < best_d[:, k - 1])

            @pl.when(improves)
            def _merge():
                d2m = d2
                bd, bi = best_d[:], best_i[:]
                for _ in range(k):
                    cand_d = jnp.min(d2m, axis=1)
                    cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)
                    cand_i = cand_a + tile_id * tile_n
                    bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
                    d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
                best_d[:] = bd
                best_i[:] = bi

            return

        # big-N body: per-8-row subgroup gating (amortized by TN=8192 tiles)
        n_sub = tm // _SUB
        # bounds over REAL refs only (sentinels stay in the distance pass
        # but must not inflate the box, or natural-order tiles containing
        # any invalid pixel would never be skipped)
        r_real = jnp.all(jnp.abs(r) < _SENTINEL_MIN, axis=0, keepdims=True)
        rlo = jnp.min(jnp.where(r_real, r, jnp.inf), axis=1)  # (3,)
        rhi = jnp.max(jnp.where(r_real, r, -jnp.inf), axis=1)  # (3,)
        qg = q.reshape(n_sub, _SUB, 3)
        glo = jnp.min(qg, axis=1)  # (n_sub, 3)
        ghi = jnp.max(qg, axis=1)  # (n_sub, 3)
        gap = jnp.maximum(0.0, jnp.maximum(glo - rhi[None, :], rlo[None, :] - ghi))
        lb = jnp.sum(gap * gap, axis=1)  # (n_sub,)
        worst = jnp.max(best_d[:, k - 1].reshape(n_sub, _SUB), axis=1)  # (n_sub,)

        col = jax.lax.broadcasted_iota(jnp.int32, (_SUB, r.shape[1]), 1)
        for g in range(n_sub):
            @pl.when(lb[g] < worst[g])
            def _subgroup(g=g):
                qs = q[g * _SUB : (g + 1) * _SUB]  # (SUB, 3)
                dx = qs[:, 0:1] - r[0:1, :]
                dy = qs[:, 1:2] - r[1:2, :]
                dz = qs[:, 2:3] - r[2:3, :]
                d2 = dx * dx + dy * dy + dz * dz  # (SUB, TN)
                bd = best_d[g * _SUB : (g + 1) * _SUB, :]
                bi = best_i[g * _SUB : (g + 1) * _SUB, :]
                d2m = d2
                for _ in range(k):
                    cand_d = jnp.min(d2m, axis=1)
                    cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)
                    cand_i = cand_a + tile_id * tile_n
                    bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
                    d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
                best_d[g * _SUB : (g + 1) * _SUB, :] = bd
                best_i[g * _SUB : (g + 1) * _SUB, :] = bi

    @pl.when(t == n_tiles - 1)
    def _write():
        d_out[0] = best_d[:]
        i_out[0] = best_i[:]


def _demand_kernel(
    q_ref, r_hbm, order_hbm, lb_hbm, d_out, i_out,
    ref_buf, sems, best_d, best_i, order_s, lb_s, meta_sems,
    *, k, tile_n, n_tiles, n_qtiles, sub_gate,
):
    """One program per QUERY tile; lb-sorted ref tiles are demand-paged.

    The grid version pays a program launch + a 96KB ref-tile DMA for every
    (qtile, rtile) pair even when the gate skips it — 60k programs at
    config-#4 scale, the measured kernel floor (docs/PERF_NOTES.md round 3
    tile sweep). Here the ref-tile loop lives INSIDE the kernel as a
    ``while_loop`` with double-buffered ``make_async_copy``: it walks tiles
    in ascending-lower-bound order and terminates the moment the next
    bound cannot beat the running worst k-th distance — tiles past that
    point are never launched, never DMA'd, never branched on. Work and
    traffic are proportional to the tiles actually needed (~a handful per
    query tile on real scenes), not to the grid.
    """
    b = pl.program_id(0)
    im = pl.program_id(1)

    # stage this query tile's visit order + bounds into SMEM. The arrays are
    # (B*Mt, 1, nt_pad): far beyond SMEM as whole scalar-prefetch operands
    # once tiles shrink, and laid out with the row index on an OUTER
    # (untiled) dim — dynamic slicing of a tiled sublane dim is a Mosaic
    # error; outer-dim slices are unconstrained.
    row = b * n_qtiles + im
    ometa = pltpu.make_async_copy(order_hbm.at[row], order_s, meta_sems.at[0])
    lmeta = pltpu.make_async_copy(lb_hbm.at[row], lb_s, meta_sems.at[1])
    ometa.start()
    lmeta.start()

    best_d[:] = jnp.full(best_d.shape, jnp.inf, jnp.float32)
    best_i[:] = jnp.zeros(best_i.shape, jnp.int32)
    q = q_ref[0]  # (TM, 4) — 4th coordinate is zero (DMA sublane alignment)
    tm = q.shape[0]
    ometa.wait()
    lmeta.wait()

    def start_dma(t):
        slot = jax.lax.rem(t, 2)
        tile = order_s[0, t]
        pltpu.make_async_copy(
            r_hbm.at[b, :, pl.ds(tile * tile_n, tile_n)],
            ref_buf.at[slot],
            sems.at[slot],
        ).start()

    def wait_dma(t):
        slot = jax.lax.rem(t, 2)
        tile = order_s[0, t]
        pltpu.make_async_copy(
            r_hbm.at[b, :, pl.ds(tile * tile_n, tile_n)],
            ref_buf.at[slot],
            sems.at[slot],
        ).wait()

    @pl.when(lb_s[0, 0] < jnp.inf)
    def _first():
        start_dma(0)

    def cond(carry):
        t, worst, _pending = carry
        # clamp the scalar read: at t == n_tiles the select ignores it but
        # both operands are still evaluated
        lb_t = lb_s[0, jnp.minimum(t, n_tiles - 1)]
        return jax.lax.select(t < n_tiles, lb_t < worst, False)

    def body(carry):
        t, worst, _pending = carry
        # prefetch the next tile iff its bound can still matter under the
        # CURRENT worst (worst only shrinks, so skipping here is safe).
        # `prefetched` rides the carry so an exit right after a speculative
        # start can drain the in-flight DMA (an unawaited DMA at kernel end
        # is a hardware error).
        lb_next = lb_s[0, jnp.minimum(t + 1, n_tiles - 1)]
        prefetched = (t + 1 < n_tiles) & (lb_next < worst)

        @pl.when(prefetched)
        def _pref():
            start_dma(t + 1)

        wait_dma(t)
        slot = jax.lax.rem(t, 2)
        r = ref_buf[slot]  # (4, TN) — zero 4th row
        tile_id = order_s[0, t]

        if not sub_gate:
            dx = q[:, 0:1] - r[0:1, :]
            dy = q[:, 1:2] - r[1:2, :]
            dz = q[:, 2:3] - r[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz  # (TM, TN)
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            row_min = jnp.min(d2, axis=1)
            improves = jnp.any(row_min < best_d[:, k - 1])

            @pl.when(improves)
            def _merge():
                d2m = d2
                bd, bi = best_d[:], best_i[:]
                for _ in range(k):
                    cand_d = jnp.min(d2m, axis=1)
                    cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)
                    cand_i = cand_a + tile_id * tile_n
                    bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
                    d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
                best_d[:] = bd
                best_i[:] = bi
        else:
            n_sub = tm // _SUB
            # bounds over 4 coords: the zero 4th row gives gap 0 everywhere,
            # so padding never changes a lower bound
            r_real = jnp.all(jnp.abs(r) < _SENTINEL_MIN, axis=0, keepdims=True)
            rlo = jnp.min(jnp.where(r_real, r, jnp.inf), axis=1)  # (4,)
            rhi = jnp.max(jnp.where(r_real, r, -jnp.inf), axis=1)
            qg = q.reshape(n_sub, _SUB, 4)
            glo = jnp.min(qg, axis=1)
            ghi = jnp.max(qg, axis=1)
            gap = jnp.maximum(
                0.0, jnp.maximum(glo - rhi[None, :], rlo[None, :] - ghi)
            )
            lb_sub = jnp.sum(gap * gap, axis=1)  # (n_sub,)
            worst_sub = jnp.max(
                best_d[:, k - 1].reshape(n_sub, _SUB), axis=1
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (_SUB, r.shape[1]), 1)
            for g in range(n_sub):
                @pl.when(lb_sub[g] < worst_sub[g])
                def _subgroup(g=g):
                    qs = q[g * _SUB : (g + 1) * _SUB]
                    dx = qs[:, 0:1] - r[0:1, :]
                    dy = qs[:, 1:2] - r[1:2, :]
                    dz = qs[:, 2:3] - r[2:3, :]
                    d2 = dx * dx + dy * dy + dz * dz
                    bd = best_d[g * _SUB : (g + 1) * _SUB, :]
                    bi = best_i[g * _SUB : (g + 1) * _SUB, :]
                    d2m = d2
                    for _ in range(k):
                        cand_d = jnp.min(d2m, axis=1)
                        cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)
                        cand_i = cand_a + tile_id * tile_n
                        bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
                        d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
                    best_d[g * _SUB : (g + 1) * _SUB, :] = bd
                    best_i[g * _SUB : (g + 1) * _SUB, :] = bi

        worst = jnp.max(best_d[:, k - 1])
        # invariant: cond(t+1) implies prefetched (worst only shrank), so a
        # true cond always finds its tile's DMA in flight
        return t + 1, worst, prefetched

    t_fin, _worst_fin, pending = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.inf, False)
    )

    @pl.when(pending)  # loop exited right after a speculative start: drain
    def _drain():
        wait_dma(t_fin)

    d_out[0] = best_d[:]
    i_out[0] = best_i[:]


def _vmem_kernel(
    q_ref, r_ref, order_hbm, lb_hbm, d_out, i_out,
    best_d, best_i, order_s, lb_s, meta_sems,
    *, k, tile_n, n_tiles, n_qtiles,
):
    """Demand-gated kNN with the WHOLE sorted ref cloud VMEM-resident.

    The round-5 visit-count simulation (runs/r5_knn_gate_sim.json) showed the
    demand-paged kernel at fusion scale spends more on per-visit OVERHEAD
    (~1.2 us: DMA start/wait, semaphores, prefetch branch, drain logic) than
    on the visited tiles' arithmetic — and that the overhead floor prevents
    the smaller tiles whose simulated work fraction is 2-3x lower from ever
    paying. At 96k refs the sorted cloud is ~1.5 MB: it fits in VMEM whole.
    The refs ride a (1, nt, 4, TN) BlockSpec whose index_map depends only on
    the batch index, so Pallas's block revisiting fetches them ONCE per
    batch row; the lb-sorted visit loop indexes tiles on the OUTER (untiled)
    dim — no DMA, no semaphores, no speculative prefetch to drain.
    """
    b = pl.program_id(0)
    im = pl.program_id(1)

    row = b * n_qtiles + im
    ometa = pltpu.make_async_copy(order_hbm.at[row], order_s, meta_sems.at[0])
    lmeta = pltpu.make_async_copy(lb_hbm.at[row], lb_s, meta_sems.at[1])
    ometa.start()
    lmeta.start()

    best_d[:] = jnp.full(best_d.shape, jnp.inf, jnp.float32)
    best_i[:] = jnp.zeros(best_i.shape, jnp.int32)
    q = q_ref[0]  # (TM, 4) — zero 4th coordinate
    ometa.wait()
    lmeta.wait()

    def cond(carry):
        t, worst = carry
        lb_t = lb_s[0, jnp.minimum(t, n_tiles - 1)]
        return jax.lax.select(t < n_tiles, lb_t < worst, False)

    def body(carry):
        t, _worst = carry
        tile_id = order_s[0, t]
        r = r_ref[0, tile_id]  # (4, TN): dynamic index on the outer dim
        dx = q[:, 0:1] - r[0:1, :]
        dy = q[:, 1:2] - r[1:2, :]
        dz = q[:, 2:3] - r[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz  # (TM, TN)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        row_min = jnp.min(d2, axis=1)
        improves = jnp.any(row_min < best_d[:, k - 1])

        @pl.when(improves)
        def _merge():
            d2m = d2
            bd, bi = best_d[:], best_i[:]
            for _ in range(k):
                cand_d = jnp.min(d2m, axis=1)
                cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)
                cand_i = cand_a + tile_id * tile_n
                bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
                d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
            best_d[:] = bd
            best_i[:] = bi

        return t + 1, jnp.max(best_d[:, k - 1])

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.inf))
    d_out[0] = best_d[:]
    i_out[0] = best_i[:]


def _vmem_call(q4, rT4, order, lb_sorted, *, k, tile_m, tile_n):
    """Invoke _vmem_kernel on prepped operands (same contract as
    _demand_call; refs reshaped to tile-outer (B, nt, 4, TN) layout)."""
    B, M_pad, _ = q4.shape
    N_pad = rT4.shape[-1]
    nt = N_pad // tile_n
    r4v = jnp.swapaxes(rT4.reshape(B, 4, nt, tile_n), 1, 2)  # (B, nt, 4, TN)
    nt_pad = pl.cdiv(nt, 128) * 128
    if nt_pad > nt:
        order = jnp.pad(order, ((0, 0), (0, 0), (0, nt_pad - nt)))
        lb_sorted = jnp.pad(
            lb_sorted, ((0, 0), (0, 0), (0, nt_pad - nt)),
            constant_values=jnp.inf,
        )
    n_qtiles = M_pad // tile_m
    order_rows = order.reshape(B * n_qtiles, 1, nt_pad)
    lb_rows = lb_sorted.reshape(B * n_qtiles, 1, nt_pad)

    grid = (B, n_qtiles)
    kernel = functools.partial(
        _vmem_kernel, k=k, tile_n=tile_n, n_tiles=nt, n_qtiles=n_qtiles
    )
    d_s, i_s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, 4), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
            # whole ref cloud; index_map ignores im -> fetched once per b
            # (Pallas block revisiting), resident across the qtile sweep
            pl.BlockSpec(
                (1, nt, 4, tile_n),
                lambda b, im: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # visit order
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # lb
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, k), jnp.float32),
            pltpu.VMEM((tile_m, k), jnp.int32),
            pltpu.SMEM((1, nt_pad), jnp.int32),
            pltpu.SMEM((1, nt_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.int32),
        ],
    )(q4, r4v, order_rows, lb_rows)
    return d_s, i_s


def _demand_call(q4, rT4, order, lb_sorted, *, k, tile_m, tile_n, sub_gate):
    """Invoke _demand_kernel on prepped operands.

    q4 (B, M_pad, 4) sorted+padded queries; rT4 (B, 4, N_pad) sorted+padded
    transposed refs; order/lb_sorted (B, Mt, Nt) visit lists. Returns
    (d_s, i_s) over SORTED query rows with SORTED ref indices.
    """
    B, M_pad, _ = q4.shape
    N_pad = rT4.shape[-1]
    nt = N_pad // tile_n
    # pad the visit lists to 128 lanes so each (nt,) row DMAs whole-row
    # aligned into SMEM; the padded entries carry lb=+inf and are never
    # visited (n_tiles keeps the real count)
    nt_pad = pl.cdiv(nt, 128) * 128
    if nt_pad > nt:
        order = jnp.pad(order, ((0, 0), (0, 0), (0, nt_pad - nt)))
        lb_sorted = jnp.pad(
            lb_sorted, ((0, 0), (0, 0), (0, nt_pad - nt)),
            constant_values=jnp.inf,
        )
    n_qtiles = M_pad // tile_m
    order_rows = order.reshape(B * n_qtiles, 1, nt_pad)
    lb_rows = lb_sorted.reshape(B * n_qtiles, 1, nt_pad)

    grid = (B, M_pad // tile_m)
    kernel = functools.partial(
        _demand_kernel, k=k, tile_n=tile_n, n_tiles=nt, n_qtiles=n_qtiles,
        sub_gate=sub_gate,
    )
    d_s, i_s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, 4), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # refs
            # explicit HBM: in VMEM, dynamic sublane slicing of the (Mt, nt)
            # rows is tiling-restricted; HBM DMA slices are unconstrained
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # visit order
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # lb
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im: (b, im, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, tile_n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile_m, k), jnp.float32),
            pltpu.VMEM((tile_m, k), jnp.int32),
            pltpu.SMEM((1, nt_pad), jnp.int32),
            pltpu.SMEM((1, nt_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.int32),
        ],
    )(q4, rT4, order_rows, lb_rows)
    return d_s, i_s


def _inverse_perm(order):
    """Invert a (B, M) permutation by scatter — one pass, vs argsort's
    O(M log^2 M) sorting-network passes (measured ~1-2 ms at M=8192 on v5e)."""
    B, M = order.shape
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    return jnp.zeros((B, M), jnp.int32).at[
        jnp.arange(B)[:, None], order
    ].set(iota, mode="drop", unique_indices=True)


def _unmap(d_s, i_s, q_order, r_order, M, N):
    """Map kernel outputs back to original query order / ref indices."""
    B = d_s.shape[0]
    k = d_s.shape[-1]
    d_s, i_s = d_s[:, :M], i_s[:, :M]
    if r_order is None:
        i_orig = jnp.clip(i_s, 0, N - 1)
    else:
        i_orig = jnp.take_along_axis(
            r_order, jnp.clip(i_s, 0, N - 1).reshape(B, -1), axis=1
        ).reshape(B, M, k)
    inv = _inverse_perm(q_order)
    d = jnp.take_along_axis(d_s, inv[..., None], axis=1)
    i = jnp.take_along_axis(i_orig, inv[..., None], axis=1)
    return d, i


# cap for the EXPLICIT use_vmem=True path: above this ref count the sorted
# cloud (>2 MB + sublane pad) no longer fits VMEM alongside the working
# tiles. NOT a dispatch threshold — the demand kernel is the production
# path at every size (runs/r5_vmem_knn_bench.json: the vmem variant is a
# wash; per-visit cost is predication, not DMA).
_VMEM_N_MAX = 1 << 17
_VMEM_TILE_M = 64
_VMEM_TILE_N = 1024


def _knn_forward_demand(
    queries, refs, k: int, *, tile_m=None, tile_n=None, sub_gate=None,
    sort_refs=True, use_vmem=None,
):
    """Demand-paged gated kNN forward (see _demand_kernel / _vmem_kernel)."""
    B, M, _ = queries.shape
    N = refs.shape[1]
    big = N >= _BIG_N
    if use_vmem is None:
        # measured at fusion scale (runs/r5_vmem_knn_bench.json): the
        # VMEM-resident variant is a WASH vs the demand kernel at the best
        # geometry (12.0 vs 11.7 ms) — the per-visit cost is predication/
        # loop structure, not DMA. Demand stays the production path; the
        # vmem kernel remains available for sweeps.
        use_vmem = False
    if use_vmem:
        if N > _VMEM_N_MAX:
            raise ValueError(
                f"use_vmem=True needs the ref cloud VMEM-resident: "
                f"N={N} > {_VMEM_N_MAX}"
            )
        tile_m = tile_m or min(_VMEM_TILE_M, max(_SUB, M))
        tile_n = tile_n or _VMEM_TILE_N
        sub_gate = False
    else:
        tile_m = tile_m or min(
            _DEMAND_TILE_M if big else min(_DEMAND_TILE_M_SMALL, _TILE_M),
            max(_SUB, M),
        )
        if tile_n is None:
            tile_n = _DEMAND_TILE_N_BIG if big else _TILE_N
        if sub_gate is None:
            sub_gate = big

    q_sorted, r_sorted, q_order, r_order, order, lb_sorted, M_pad, N_pad = _prepare(
        queries, refs, tile_m, tile_n, sort_refs=sort_refs
    )
    # pad the coordinate axis 3 -> 4 with zeros: Mosaic requires DMA slice
    # sublane dims aligned to 4, and a zero coordinate changes neither
    # distances nor bounds
    q4 = jnp.pad(q_sorted, ((0, 0), (0, 0), (0, 1)))
    rT4 = jnp.pad(
        jnp.swapaxes(r_sorted, 1, 2), ((0, 0), (0, 1), (0, 0))
    )  # (B, 4, N_pad)
    if use_vmem:
        d_s, i_s = _vmem_call(
            q4, rT4, order, lb_sorted, k=k, tile_m=tile_m, tile_n=tile_n
        )
    else:
        d_s, i_s = _demand_call(
            q4, rT4, order, lb_sorted,
            k=k, tile_m=tile_m, tile_n=tile_n, sub_gate=sub_gate,
        )
    return _unmap(d_s, i_s, q_order, r_order, M, N)


def _prepare(queries, refs, tile_m, tile_n, sort_refs=True):
    """Morton-sort the queries (and refs unless ``sort_refs=False``), pad to
    tiles, rank ref tiles per query tile.

    ``sort_refs=False`` is the NATURAL-ORDER mode for refs that are already
    spatially coherent in memory — unprojected pixel clouds in scanline
    order, where a tile of consecutive pixels is a compact image slab. It
    skips the ref-side argsort + 3N-element gather (the dominant prep cost
    at config-#4 scale, ~1.23M refs) and the index un-mapping; tile AABBs
    are computed over real (non-sentinel) coords only, so invalid-depth
    pixels scattered through the scanlines don't inflate the bounds."""
    B, M, _ = queries.shape
    N = refs.shape[1]
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)

    # Quantization box from the queries (chunk): refs far outside clamp to
    # boundary cells; their tiles get distant AABBs -> visited last, skipped.
    lo = jnp.min(q, axis=1, keepdims=True)
    hi = jnp.max(q, axis=1, keepdims=True)

    q_order = jnp.argsort(_morton_code(q, lo, hi), axis=1).astype(jnp.int32)
    q_sorted = jnp.take_along_axis(q, q_order[..., None], axis=1)
    if sort_refs:
        r_order = jnp.argsort(_morton_code(r, lo, hi), axis=1).astype(jnp.int32)
        r_sorted = jnp.take_along_axis(r, r_order[..., None], axis=1)
    else:
        r_order = None
        r_sorted = r

    M_pad = pl.cdiv(M, tile_m) * tile_m
    N_pad = pl.cdiv(N, tile_n) * tile_n
    if M_pad > M:
        q_sorted = jnp.pad(
            q_sorted, ((0, 0), (0, M_pad - M), (0, 0)), constant_values=_PAD_COORD
        )
    if N_pad > N:
        r_sorted = jnp.pad(
            r_sorted, ((0, 0), (0, N_pad - N), (0, 0)), constant_values=_PAD_COORD
        )

    qlo, qhi = _tile_bounds(q_sorted, tile_m)
    rlo, rhi = _tile_bounds(r_sorted, tile_n)
    lb = _box_sqdist(qlo, qhi, rlo, rhi)  # (B, Mt, Nt)
    order = jnp.argsort(lb, axis=-1).astype(jnp.int32)  # nearest tiles first
    lb_sorted = jnp.take_along_axis(lb, order, axis=-1)  # lb in visit order
    return q_sorted, r_sorted, q_order, r_order, order, lb_sorted, M_pad, N_pad


def _knn_forward(
    queries, refs, k: int, *, tile_m=None, tile_n=None, sub_gate=None,
    sort_refs=True,
):
    """tile_m/tile_n/sub_gate default to the measured dispatch policy; the
    overrides exist for tools/knn_gate_bench.py parameter sweeps."""
    B, M, _ = queries.shape
    N = refs.shape[1]
    tile_m = tile_m or min(_TILE_M, max(_SUB, M))
    big = N >= _BIG_N
    if tile_n is None:
        tile_n = _TILE_N_BIG if big else _TILE_N
    if sub_gate is None:
        sub_gate = big

    q_sorted, r_sorted, q_order, r_order, order, lb_sorted, M_pad, N_pad = _prepare(
        queries, refs, tile_m, tile_n, sort_refs=sort_refs
    )
    nt = N_pad // tile_n
    rT = jnp.swapaxes(r_sorted, 1, 2)  # (B, 3, N_pad)

    grid = (B, M_pad // tile_m, nt)
    kernel = functools.partial(_gated_kernel, k=k, tile_n=tile_n, sub_gate=sub_gate)
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
    d_s, i_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((B, M_pad, k), jnp.int32),
        ],
    )(order, lb_sorted, q_sorted, rT)

    d_s, i_s = d_s[:, :M], i_s[:, :M]
    if r_order is None:  # natural-order refs: kernel indices ARE original
        i_orig = jnp.clip(i_s, 0, N - 1)
    else:
        # sorted-ref index -> original ref index (padding columns can only
        # win in degenerate <k-valid-ref cases; the clamp keeps the gather
        # in range)
        i_orig = jnp.take_along_axis(
            r_order, jnp.clip(i_s, 0, N - 1).reshape(B, -1), axis=1
        ).reshape(B, M, k)
    # unsort the queries
    inv = _inverse_perm(q_order)
    d = jnp.take_along_axis(d_s, inv[..., None], axis=1)
    i = jnp.take_along_axis(i_orig, inv[..., None], axis=1)
    return d, i


# production forward: demand-paged (in-kernel while over lb-sorted tiles,
# double-buffered DMA, true early exit). The grid variant (_knn_forward)
# stays for A/B measurement (tools/knn_split_bench.py).
_USE_DEMAND = True


def _forward(queries, refs, k, sort_refs):
    fwd = _knn_forward_demand if _USE_DEMAND else _knn_forward
    return fwd(queries, refs, k, sort_refs=sort_refs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def knn_gated(queries, refs, k: int, sort_refs: bool = True):
    return _forward(queries, refs, k, sort_refs)


def _fwd(queries, refs, k, sort_refs):
    d, i = _forward(queries, refs, k, sort_refs)
    return (d, i), (queries, refs, i)


def _bwd(k, sort_refs, residuals, cotangents):
    return _knn_bwd(k, residuals, cotangents)


# backward is pure index math on original-space indices — identical to the
# brute kernel's analytic VJP
knn_gated.defvjp(_fwd, _bwd)


@jax.tree_util.register_pytree_node_class
class PreparedRefs:
    """A ref cloud prepped ONCE for many kNN queries (SURVEY.md §7 hard
    part 3 / BASELINE config #4): Morton sort + gather + tile AABBs are the
    dominant per-call prep at 1.23M refs (~60 ms of the 124 ms full call,
    docs/PERF_NOTES.md round 3) and depend only on the refs — a whole-scene
    consumer (eval/scene_fused.py) amortizes them across every chunk window
    of the scene.

    Registered as a pytree with ``n``/``tile_n`` as STATIC aux data so a
    PreparedRefs can cross jit boundaries (tile geometry shapes the kernel
    grid and must stay Python ints under tracing).

    Fields: rT4 (B, 4, N_pad) Morton-sorted transposed refs with a zero 4th
    row; r_order (B, N) sorted-position -> original index; rlo / rhi
    (B, Nt, 3) per-tile AABBs over real coords; n original ref count;
    tile_n tile geometry the sort was built for."""

    def __init__(self, rT4, r_order, rlo, rhi, n: int, tile_n: int):
        self.rT4 = rT4
        self.r_order = r_order
        self.rlo = rlo
        self.rhi = rhi
        self.n = n
        self.tile_n = tile_n

    def tree_flatten(self):
        return (self.rT4, self.r_order, self.rlo, self.rhi), (self.n, self.tile_n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def prepare_refs(refs, tile_n: int | None = None) -> PreparedRefs:
    """Morton-sort a ref cloud and precompute its tile bounds.

    The quantization box comes from the refs' REAL (non-sentinel) coords —
    unlike the fused path, which boxes by the query chunk — so the result is
    query-independent and reusable. Box choice affects only sort locality,
    never correctness: bounds and distances are computed in world coords.
    """
    B, N, _ = refs.shape
    big = N >= _BIG_N
    if tile_n is None:
        tile_n = _DEMAND_TILE_N_BIG if big else _TILE_N
    r = refs.astype(jnp.float32)
    real = jnp.all(jnp.abs(r) < _SENTINEL_MIN, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(real, r, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(real, r, -jnp.inf), axis=1, keepdims=True)
    r_order = jnp.argsort(_morton_code(r, lo, hi), axis=1).astype(jnp.int32)
    r_sorted = jnp.take_along_axis(r, r_order[..., None], axis=1)
    N_pad = pl.cdiv(N, tile_n) * tile_n
    if N_pad > N:
        r_sorted = jnp.pad(
            r_sorted, ((0, 0), (0, N_pad - N), (0, 0)), constant_values=_PAD_COORD
        )
    rlo, rhi = _tile_bounds(r_sorted, tile_n)
    rT4 = jnp.pad(jnp.swapaxes(r_sorted, 1, 2), ((0, 0), (0, 1), (0, 0)))
    return PreparedRefs(rT4, r_order, rlo, rhi, N, tile_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def knn_prepared(queries, prepared: PreparedRefs, k: int):
    """Demand-paged gated kNN against a prepare_refs() cloud.

    Per-call work is query-side only: query Morton sort (M elements, not N),
    query tile bounds, and the (Mt, Nt) visit-order ranking. Same exactness
    contract as knn_gated.

    Differentiable (round-5 VERDICT missing #7 — enables scene-level
    fine-tuning through the prepared path): the custom VJP routes distance
    cotangents to the queries and to ``prepared.rT4`` in SORTED space, which
    composes exactly with AD through ``prepare_refs``'s jnp sort/gather when
    the caller differentiates w.r.t. the underlying refs. Tile bounds and
    the visit order only pick WHICH exact results are computed — the output
    is piecewise constant in them, so their zero tangents are exact almost
    everywhere (as for any argsort/top-k).
    """
    return _knn_prepared_impl(queries, prepared, k)


def _knn_prepared_impl(queries, prepared: PreparedRefs, k: int):
    B, M, _ = queries.shape
    assert prepared.rT4.shape[0] == B, (
        f"batch mismatch: queries {B} vs prepared refs {prepared.rT4.shape[0]}"
    )
    N_pad = prepared.rT4.shape[-1]
    tile_n = prepared.tile_n
    big = N_pad >= _BIG_N
    tile_m = min(
        _DEMAND_TILE_M if big else min(_DEMAND_TILE_M_SMALL, _TILE_M),
        max(_SUB, M),
    )
    sub_gate = big

    q = queries.astype(jnp.float32)
    lo = jnp.min(q, axis=1, keepdims=True)
    hi = jnp.max(q, axis=1, keepdims=True)
    q_order = jnp.argsort(_morton_code(q, lo, hi), axis=1).astype(jnp.int32)
    q_sorted = jnp.take_along_axis(q, q_order[..., None], axis=1)
    M_pad = pl.cdiv(M, tile_m) * tile_m
    if M_pad > M:
        q_sorted = jnp.pad(
            q_sorted, ((0, 0), (0, M_pad - M), (0, 0)), constant_values=_PAD_COORD
        )
    qlo, qhi = _tile_bounds(q_sorted, tile_m)
    lb = _box_sqdist(qlo, qhi, prepared.rlo, prepared.rhi)
    order = jnp.argsort(lb, axis=-1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb, order, axis=-1)

    q4 = jnp.pad(q_sorted, ((0, 0), (0, 0), (0, 1)))
    d_s, i_s = _demand_call(
        q4, prepared.rT4, order, lb_sorted,
        k=k, tile_m=tile_m, tile_n=tile_n, sub_gate=sub_gate,
    )
    return _unmap(d_s, i_s, q_order, prepared.r_order, M, prepared.n)


def _prepared_fwd(queries, prepared, k):
    d, i = _knn_prepared_impl(queries, prepared, k)
    return (d, i), (queries, prepared, i)


def _prepared_bwd(k, residuals, cotangents):
    import numpy as _np

    queries, prepared, idx = residuals
    g_d, _ = cotangents  # no gradient through indices
    q = queries.astype(jnp.float32)
    B, M, _ = q.shape
    N_pad = prepared.rT4.shape[-1]

    # original ref index -> its row in the SORTED (rT4) layout
    inv = _inverse_perm(prepared.r_order)  # (B, N)
    pos = jnp.take_along_axis(
        inv, idx.reshape(B, M * k), axis=1
    )  # (B, M*k) sorted rows
    refs_sorted = jnp.swapaxes(prepared.rT4[:, :3, :], 1, 2)  # (B, N_pad, 3)
    nbr = jnp.take_along_axis(refs_sorted, pos[..., None], axis=1).reshape(
        B, M, k, 3
    )
    diff = 2.0 * (q[:, :, None, :] - nbr)  # d|q-r|^2/dq
    g = g_d[..., None].astype(jnp.float32) * diff
    dq = jnp.sum(g, axis=2).astype(queries.dtype)

    # cotangent for the sorted transposed refs; the zero 4th row stays zero
    dr_sorted = jnp.zeros((B, N_pad, 3), jnp.float32).at[
        jnp.arange(B)[:, None], pos
    ].add(-g.reshape(B, M * k, 3))
    d_rT4 = jnp.pad(
        jnp.swapaxes(dr_sorted, 1, 2), ((0, 0), (0, 1), (0, 0))
    ).astype(prepared.rT4.dtype)

    d_prepared = PreparedRefs(
        d_rT4,
        _np.zeros(prepared.r_order.shape, dtype=jax.dtypes.float0),  # int leaf
        jnp.zeros_like(prepared.rlo),
        jnp.zeros_like(prepared.rhi),
        prepared.n,
        prepared.tile_n,
    )
    return dq, d_prepared


knn_prepared.defvjp(_prepared_fwd, _prepared_bwd)


def knn(queries, refs, k: int, ref_mask=None, refs_coherent: bool = False):
    """Gated Pallas kNN with the reference contract (ops.reference.knn).

    ``refs_coherent=True``: the caller asserts refs are already spatially
    coherent in memory order (scanline pixel clouds) — skip the ref-side
    Morton sort (exactness unaffected; only the tile bounds' quality, and
    hence speed, depends on coherence).

    Contract: real coordinates must satisfy ``|coord| < _SENTINEL_MIN``
    (1e5); larger magnitudes are read as invalid-point sentinels and
    excluded from pruning bounds, so a legitimately huge-coordinate ref
    could be wrongly pruned (advisor round-3 low #2 — scale to meters)."""
    if ref_mask is not None:
        refs = jnp.where(ref_mask[..., None], refs, jnp.asarray(1e9, refs.dtype))
    return knn_gated(queries, refs, k, not refs_coherent)
