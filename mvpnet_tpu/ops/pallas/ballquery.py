"""Fixed-K ball query Pallas kernel (fused distance + first-K selection).

Replaces mvpnet/ops/ball_query (UNVERIFIED; SURVEY.md §2.1 row 2) without
materializing the (B, M, N) distance matrix the jnp reference builds (256MB
at SA level 1 scale). Semantics match ops.reference.ball_query exactly:
first ``nsample`` in-radius hits in point-index order, padded with the first
hit; empty balls fall back to the nearest point.

Selection uses the rank trick: a running per-center hit count turns each
in-ball point's within-tile cumsum rank into a global output slot; since a
slot is hit at most once per center across ALL tiles, slot values accumulate
with plain adds — no scatter needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256
_TILE_N = 2048
_MAX_K = 64


def supported(centers, points, nsample: int) -> bool:
    return (
        centers.ndim == 3
        and points.ndim == 3
        and centers.shape[-1] == 3
        and points.shape[-1] == 3
        and 1 <= nsample <= _MAX_K
        and centers.shape[1] * points.shape[1] >= (1 << 20)
    )


def _bq_kernel(
    c_ref, r_ref, idx_out, cnt_out,
    slot_buf, count_buf, near_d, near_i,
    *, k, radius2, n_total, tile_n, early_exit=True,
):
    j = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        slot_buf[:] = jnp.zeros(slot_buf.shape, jnp.int32)
        count_buf[:] = jnp.zeros(count_buf.shape, jnp.int32)
        near_d[:] = jnp.full(near_d.shape, jnp.inf, jnp.float32)
        near_i[:] = jnp.zeros(near_i.shape, jnp.int32)

    # EARLY EXIT (one scalar branch): once EVERY center row has k hits, no
    # later tile can contribute a slot < k — skip its entire body. Exact by
    # construction, but MEASURED A NET ZERO-TO-LOSS at SA scales (0.99x at
    # r0.1, 0.91x at r0.4, SA1 B8 1024x8192 K32 — tools/variant_bench.py,
    # runs/r3_variant_bench.json): the min-over-all-rows trigger requires
    # every ball full, which random chunk geometry rarely reaches early.
    # Default OFF; the flag stays for configs whose balls provably fill.
    @pl.when((j == 0) | (jnp.min(count_buf[:, 0]) < k) | (not early_exit))
    def _tile_body():
        c = c_ref[0]  # (TM, 3)
        r = r_ref[0]  # (3, TN)
        dx = c[:, 0:1] - r[0:1, :]
        dy = c[:, 1:2] - r[1:2, :]
        dz = c[:, 2:3] - r[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz  # (TM, TN)

        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        col_global = col + j * tile_n
        valid = col_global < n_total
        d2 = jnp.where(valid, d2, jnp.inf)

        # nearest-point fallback tracking (existing wins ties -> lower index)
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * tile_n
        better = tile_min < near_d[:, 0]
        near_d[:, 0] = jnp.where(better, tile_min, near_d[:, 0])
        near_i[:, 0] = jnp.where(better, tile_arg, near_i[:, 0])

        in_ball = d2 < radius2
        # inclusive prefix sum along lanes (Mosaic has no cumsum primitive):
        # Hillis-Steele scan with static shifted adds, log2(TN) rounds
        rank = in_ball.astype(jnp.int32)
        shift = 1
        while shift < rank.shape[1]:
            shifted = jnp.concatenate(
                [jnp.zeros((rank.shape[0], shift), jnp.int32), rank[:, :-shift]],
                axis=1,
            )
            rank = rank + shifted
            shift *= 2
        gslot = count_buf[:, 0:1] + rank - 1  # (TM, TN) global slot per hit
        gslot = jnp.where(in_ball, gslot, -1)
        hitcol = jnp.where(in_ball, col_global, 0)

        acc = slot_buf[:]
        slot_id = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        for s in range(k):
            contrib = jnp.sum(jnp.where(gslot == s, hitcol, 0), axis=1)  # (TM,)
            acc = acc + jnp.where(slot_id == s, contrib[:, None], 0)
        slot_buf[:] = acc
        count_buf[:, 0] = count_buf[:, 0] + jnp.sum(
            in_ball.astype(jnp.int32), axis=1
        )

    @pl.when(j == n_tiles - 1)
    def _write():
        cnt = jnp.minimum(count_buf[:, 0], k)  # (TM,)
        slots = slot_buf[:]
        first = jnp.where(count_buf[:, 0] > 0, slots[:, 0], near_i[:, 0])
        slot_id = jax.lax.broadcasted_iota(jnp.int32, slots.shape, 1)
        idx_out[0] = jnp.where(slot_id < cnt[:, None], slots, first[:, None])
        cnt_out[0] = cnt[:, None]


def ball_query(
    centers, points, radius: float, nsample: int, valid_mask=None,
    early_exit: bool = False,
):
    """Pallas ball query with the reference contract (see ops.reference)."""
    B, M, _ = centers.shape
    N = points.shape[1]
    if valid_mask is not None:
        # invalid points pushed out of every ball and out of nearest-fallback
        points = jnp.where(
            valid_mask[..., None], points, jnp.asarray(1e9, points.dtype)
        )
    c = centers.astype(jnp.float32)
    rT = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    tile_m = min(_TILE_M, max(8, M))
    tile_n = min(_TILE_N, max(128, N))
    grid = (B, pl.cdiv(M, tile_m), pl.cdiv(N, tile_n))

    kernel = functools.partial(
        _bq_kernel,
        k=nsample,
        radius2=float(radius) ** 2,
        n_total=N,
        tile_n=tile_n,
        early_exit=early_exit,
    )
    idx, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, 3), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_n), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m, nsample), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, nsample), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(11 + 3 * nsample) * B * M * N,
            bytes_accessed=4 * B * (M * 3 + N * 3 + M * (nsample + 1)),
            transcendentals=0,
        ),
    )(c, rT)
    return idx, cnt[..., 0]
