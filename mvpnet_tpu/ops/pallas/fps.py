"""Farthest point sampling Pallas kernel.

SURVEY.md §7 hard part 1: FPS is inherently sequential (npoint dependent
steps), so the kernel keeps the running min-distance vector resident in VMEM
across all steps and does one fused distance-update + argmax sweep per step
— no HBM traffic between steps, one kernel launch per batch row. Exact
semantics of the canonical CUDA kernel / jnp reference
(mvpnet_tpu/ops/reference.py): seeded at the first valid index (index 0 when
unmasked), argmax first-occurrence tie-break, optional validity mask pinning
invalid points to -inf.

Replaces mvpnet/ops/sample_farthest_points (UNVERIFIED; SURVEY.md §2.1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: refs (3, N) + dist (1, N) + mask (1, N) f32 -> N <= ~500k.
_MAX_N = 1 << 19
# batched variant keeps ~10 live (B, N) f32 planes (4 inputs + dist scratch
# + d2/new_dist/onehot/col temporaries in the kernel body): at 1<<18 that is
# ~10 MB, leaving headroom under the 16 MB/core VMEM budget (advisor round-2
# low #3: 1<<19 could exceed VMEM at the boundary even though the per-row
# kernel would have fit).
_MAX_BN = 1 << 18


def supported(points, npoint: int) -> bool:
    return (
        points.ndim == 3
        and points.shape[-1] == 3
        and points.shape[1] <= _MAX_N
        and npoint >= 1
        # tiny problems aren't worth a kernel launch
        and points.shape[1] * npoint >= (1 << 16)
    )


def _fps_kernel(r_ref, maskadd_ref, idx_out, dist_ref, *, npoint, n_total):
    px = r_ref[0, 0:1, :]  # (1, N)
    py = r_ref[0, 1:2, :]
    pz = r_ref[0, 2:3, :]
    maskadd = maskadd_ref[0]  # (1, N): 0 valid, -inf invalid/tail

    # dist starts at +inf for valid points, -inf for invalid
    dist_ref[:] = jnp.where(maskadd == 0.0, jnp.inf, -jnp.inf)
    col = jax.lax.broadcasted_iota(jnp.int32, px.shape, 1)
    # selected-index vector built by per-step select (scalar VMEM stores are
    # not supported by Mosaic); slot 0 is the seed = first valid index
    # (index 0 when unmasked — reference.farthest_point_sample contract)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    # argmax over a f32 indicator (Mosaic reductions don't take bools)
    seed = jnp.argmax(jnp.where(maskadd == 0.0, 1.0, 0.0), axis=1)[0].astype(
        jnp.int32
    )

    def body(i, carry):
        last_idx, idx_vec = carry
        # coords of the last selected point via masked reduction (cheap and
        # avoids a dynamic cross-lane slice)
        onehot = col == last_idx
        x = jnp.sum(jnp.where(onehot, px, 0.0))
        y = jnp.sum(jnp.where(onehot, py, 0.0))
        z = jnp.sum(jnp.where(onehot, pz, 0.0))
        d2 = (px - x) ** 2 + (py - y) ** 2 + (pz - z) ** 2 + maskadd
        new_dist = jnp.minimum(dist_ref[:], d2)
        dist_ref[:] = new_dist
        nxt = jnp.argmax(new_dist, axis=1)[0].astype(jnp.int32)
        idx_vec = jnp.where(out_slot == i, nxt, idx_vec)
        return nxt, idx_vec

    _, idx_vec = jax.lax.fori_loop(
        1, npoint, body, (seed, jnp.where(out_slot == 0, seed, 0))
    )
    idx_out[0] = idx_vec


def _fps_batched_kernel(px_ref, py_ref, pz_ref, maskadd_ref, idx_out, dist_ref, *, npoint):
    """All batch rows advance together: each of the npoint sequential steps
    does ONE (B, N) distance-update + per-row argmax instead of B separate
    (1, N) sweeps. Same FLOPs, but the VPU sees B*N-wide vectors (full lane
    occupancy at chunk sizes) and the fori_loop overhead is paid npoint
    times instead of B*npoint times — measured 1.75x vs _fps_perrow at SA1
    scale, B8 8192->1024 (4.25 vs 7.44 ms; tools/variant_bench.py,
    runs/r3_variant_bench.json)."""
    px = px_ref[:]  # (B, N)
    py = py_ref[:]
    pz = pz_ref[:]
    maskadd = maskadd_ref[:]  # (B, N): 0 valid, -inf invalid

    B = px.shape[0]
    dist_ref[:] = jnp.where(maskadd == 0.0, jnp.inf, -jnp.inf)
    col = jax.lax.broadcasted_iota(jnp.int32, px.shape, 1)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)
    # seed = first valid index per row (0 when unmasked); f32 indicator
    # because Mosaic reductions don't take bools
    seed = jnp.argmax(jnp.where(maskadd == 0.0, 1.0, 0.0), axis=1).astype(
        jnp.int32
    )[:, None]

    def body(i, carry):
        last_idx, idx_vec = carry  # (B, 1) int32, (B, npoint) int32
        onehot = col == last_idx
        x = jnp.sum(jnp.where(onehot, px, 0.0), axis=1, keepdims=True)
        y = jnp.sum(jnp.where(onehot, py, 0.0), axis=1, keepdims=True)
        z = jnp.sum(jnp.where(onehot, pz, 0.0), axis=1, keepdims=True)
        d2 = (px - x) ** 2 + (py - y) ** 2 + (pz - z) ** 2 + maskadd
        new_dist = jnp.minimum(dist_ref[:], d2)
        dist_ref[:] = new_dist
        nxt = jnp.argmax(new_dist, axis=1).astype(jnp.int32)[:, None]
        idx_vec = jnp.where(out_slot == i, nxt, idx_vec)
        return nxt, idx_vec

    _, idx_vec = jax.lax.fori_loop(
        1,
        npoint,
        body,
        (seed, jnp.where(out_slot == 0, seed, 0)),
    )
    idx_out[:] = idx_vec


def _fps_batched(points, npoint, maskadd_2d):
    """(B, N, 3) all-rows-resident variant; maskadd_2d (B, N)."""
    B, N, _ = points.shape
    pts = points.astype(jnp.float32)
    kernel = functools.partial(_fps_batched_kernel, npoint=npoint)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * B * npoint * N,
            bytes_accessed=4 * B * (4 * N + npoint),
            transcendentals=0,
        ),
    )(pts[..., 0], pts[..., 1], pts[..., 2], maskadd_2d)


def farthest_point_sample(points, npoint: int, valid_mask=None):
    """Pallas FPS with the reference contract (see ops.reference)."""
    B, N, _ = points.shape
    if valid_mask is None:
        maskadd_2d = jnp.zeros((B, N), jnp.float32)
    else:
        maskadd_2d = jnp.where(valid_mask, 0.0, -jnp.inf).astype(jnp.float32)

    if B * N <= _MAX_BN:
        return _fps_batched(points, npoint, maskadd_2d)
    return _fps_perrow(points, npoint, maskadd_2d)


def _fps_perrow(points, npoint, maskadd_2d):
    """(1, N)-per-program variant: one grid step per batch row; VMEM holds a
    single row's planes, so it covers N up to _MAX_N where the batched
    variant's (B, N) planes would not fit."""
    B, N, _ = points.shape
    rT = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # (B, 3, N)
    maskadd = maskadd_2d[:, None, :]

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_total=N)
    idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * B * npoint * N,
            bytes_accessed=4 * B * (4 * N + npoint),
            transcendentals=0,
        ),
    )(rT, maskadd)
    return idx[:, 0, :]
