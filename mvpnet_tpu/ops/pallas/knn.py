"""Tiled brute-force kNN Pallas kernel.

The north-star op (BASELINE.json: "CPU kNN/ball-query -> on-device tiled
distance kernels"): replaces both the reference's CUDA ``knn_distance``
(mvpnet/ops/knn_distance*.cu, UNVERIFIED; SURVEY.md §2.1 row 4) and the CPU
KDTree kNN the reference dataset ran in worker processes (§3.4).

Design:
  * grid (B, M_tiles, N_tiles); the ref-tile axis is innermost, so Pallas
    pipelines ref-tile DMAs against compute and the running top-k lives in
    VMEM scratch across ref tiles.
  * refs are passed TRANSPOSED (B, 3, N): coordinates become (1, TILE_N)
    lane-aligned rows, so per-coordinate differences broadcast as
    (TILE_M, 1) x (1, TILE_N) VPU ops with no in-kernel transpose.
  * distances use the exact (a-b)^2 form (no cancellation), f32.
  * per ref tile: extract the tile's top-k via k passes of min/argmin +
    mask-out, then merge into the running sorted top-k with a vectorized
    insertion (ties resolve to the lower global index, matching
    jnp.argmin/top_k first-occurrence semantics of the reference impl).
  * custom VJP: analytic d|q-r|^2 gradients (2*(q-r) gather / scatter-add),
    so consumers like three-NN interpolation differentiate exactly as the
    jnp reference does.

Padding: query-tile tail rows are garbage but their outputs are dropped by
Pallas; ref-tile tail columns are masked to +inf via the global column id.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256
_TILE_N = 2048
_MAX_K = 8


def supported(queries, refs, k: int) -> bool:
    return (
        queries.ndim == 3
        and refs.ndim == 3
        and queries.shape[-1] == 3
        and refs.shape[-1] == 3
        and 1 <= k <= _MAX_K
        and refs.shape[1] >= k
        # below ~1M query-ref pairs the jnp path is cheap enough that kernel
        # launch + layout overheads dominate
        and queries.shape[1] * refs.shape[1] >= (1 << 20)
    )


def _merge_candidate(best_d, best_i, cand_d, cand_i):
    """Insert one candidate per row into a row-sorted (TM, k) top-k list.

    Existing entries win ties (<=), so earlier tiles / earlier columns keep
    priority — lower-index tie-breaking end to end.
    """
    k = best_d.shape[1]
    pos = jnp.sum(best_d <= cand_d[:, None], axis=1)  # (TM,)
    slot = jax.lax.broadcasted_iota(jnp.int32, best_d.shape, 1)
    posb = pos[:, None].astype(jnp.int32)
    shifted_d = jnp.concatenate([best_d[:, :1], best_d[:, : k - 1]], axis=1)
    shifted_i = jnp.concatenate([best_i[:, :1], best_i[:, : k - 1]], axis=1)
    new_d = jnp.where(
        slot < posb, best_d, jnp.where(slot == posb, cand_d[:, None], shifted_d)
    )
    new_i = jnp.where(
        slot < posb, best_i, jnp.where(slot == posb, cand_i[:, None], shifted_i)
    )
    return new_d, new_i


def _knn_kernel(q_ref, r_ref, d_out, i_out, best_d, best_i, *, k, n_total, tile_n):
    j = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full(best_d.shape, jnp.inf, jnp.float32)
        best_i[:] = jnp.zeros(best_i.shape, jnp.int32)

    q = q_ref[0]  # (TM, 3)
    r = r_ref[0]  # (3, TN)
    dx = q[:, 0:1] - r[0:1, :]
    dy = q[:, 1:2] - r[1:2, :]
    dz = q[:, 2:3] - r[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz  # (TM, TN)

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    col_global = col + j * tile_n
    d2 = jnp.where(col_global < n_total, d2, jnp.inf)

    # Early exit: skip the k-pass extraction when no row of this ref tile can
    # improve its current kth-best — after a few tiles most can't, cutting
    # the per-tile cost to the distance compute + one min reduction.
    row_min = jnp.min(d2, axis=1)  # (TM,)
    improves = jnp.any(row_min < best_d[:, k - 1])

    @pl.when(improves)
    def _merge():
        d2m = d2
        bd, bi = best_d[:], best_i[:]
        for _ in range(k):
            cand_d = jnp.min(d2m, axis=1)  # (TM,)
            cand_a = jnp.argmin(d2m, axis=1).astype(jnp.int32)  # (TM,)
            cand_i = cand_a + j * tile_n
            bd, bi = _merge_candidate(bd, bi, cand_d, cand_i)
            d2m = jnp.where(col == cand_a[:, None], jnp.inf, d2m)
        best_d[:] = bd
        best_i[:] = bi

    @pl.when(j == n_tiles - 1)
    def _write():
        d_out[0] = best_d[:]
        i_out[0] = best_i[:]


def _knn_forward(queries, refs, k: int):
    B, M, _ = queries.shape
    N = refs.shape[1]
    q = queries.astype(jnp.float32)
    rT = jnp.swapaxes(refs.astype(jnp.float32), 1, 2)  # (B, 3, N)

    tile_m = min(_TILE_M, max(8, M))
    tile_n = min(_TILE_N, max(128, N))
    grid = (B, pl.cdiv(M, tile_m), pl.cdiv(N, tile_n))

    kernel = functools.partial(
        _knn_kernel, k=k, n_total=N, tile_n=tile_n
    )
    d, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, 3), lambda b, im, jn: (b, im, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, tile_n), lambda b, im, jn: (b, 0, jn), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im, jn: (b, im, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_m, k), lambda b, im, jn: (b, im, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, k), jnp.float32),
            jax.ShapeDtypeStruct((B, M, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, k), jnp.float32),
            pltpu.VMEM((tile_m, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * B * M * N,
            bytes_accessed=4 * B * (M * 3 + N * 3 + 2 * M * k),
            transcendentals=0,
        ),
    )(q, rT)
    return d, i


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def knn_pallas(queries, refs, k: int):
    return _knn_forward(queries, refs, k)


def _knn_fwd(queries, refs, k):
    d, i = _knn_forward(queries, refs, k)
    return (d, i), (queries, refs, i)


def _knn_bwd(k, residuals, cotangents):
    queries, refs, idx = residuals
    g_d, _ = cotangents  # (B, M, k); no gradient through indices
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    # gathered neighbor coords: (B, M, k, 3)
    B, M, _ = q.shape
    flat = idx.reshape(B, M * k)
    nbr = jnp.take_along_axis(r, flat[..., None], axis=1).reshape(B, M, k, 3)
    diff = 2.0 * (q[:, :, None, :] - nbr)  # d|q-r|^2/dq
    g = g_d[..., None] * diff
    dq = jnp.sum(g, axis=2).astype(queries.dtype)
    dr = jnp.zeros_like(r)
    dr = dr.at[
        jnp.arange(B)[:, None], flat
    ].add(-g.reshape(B, M * k, 3))
    return dq, dr.astype(refs.dtype)


knn_pallas.defvjp(_knn_fwd, _knn_bwd)


def knn(queries, refs, k: int, ref_mask=None):
    """Pallas kNN with the reference contract (see ops.reference.knn)."""
    if ref_mask is not None:
        # push invalid refs far away instead of masking distances: keeps the
        # kernel mask-free; (1e9)^2 = 1e18 << f32 inf so ordering holds.
        refs = jnp.where(ref_mask[..., None], refs, jnp.asarray(1e9, refs.dtype))
    return knn_pallas(queries, refs, k)
