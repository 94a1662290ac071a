"""Spatially-sharded multi-view kNN fusion (ring exchange over the mesh).

The build's centerpiece (BASELINE.json north star; SURVEY.md §2.3 SP row and
§5 "Long-context" row): whole-building scenes are sharded across devices by
spatial chunk, each shard co-locating its view frustums' pixel clouds. A
point's k nearest feature-pixels may live on another shard, so fusion runs a
ring: each step, every shard's (pixel_xyz, pixel_feat) block rotates one hop
(``lax.ppermute`` over the ``space`` axis) while each shard folds the visiting
block into a running per-point top-k (distance-merged, lower-shard-index
tie-break). After S steps every point has seen every pixel block — the
ring-attention-shaped communication pattern, with compute overlapping the
rotation and memory bounded by one block per hop.

This is algebraically identical to kNN over the concatenated pixel cloud
followed by gathering — verified against the unsharded reference in
tests/test_dist.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvpnet_tpu import ops
from mvpnet_tpu.dist.mesh import SPACE_AXIS


def _merge_topk(best, cand, k: int):
    """Merge two (d, xyz, feat) candidate sets along the last-neighbor axis,
    keeping the k smallest distances (stable: ``best`` wins ties)."""
    d = jnp.concatenate([best[0], cand[0]], axis=-1)  # (..., N, 2k)
    xyz = jnp.concatenate([best[1], cand[1]], axis=-2)
    feat = jnp.concatenate([best[2], cand[2]], axis=-2)
    # stable ascending selection of k smallest
    neg, sel = jax.lax.top_k(-d, k)  # top_k is stable -> lower index wins ties
    new_d = -neg
    new_xyz = jnp.take_along_axis(xyz, sel[..., None], axis=-2)
    new_feat = jnp.take_along_axis(feat, sel[..., None], axis=-2)
    return new_d, new_xyz, new_feat


def ring_knn_local(points, pixel_xyz, pixel_feat, *, k: int, axis: str, unroll: bool = False):
    """Ring kNN body — call from inside shard_map over ``axis``.

    Per-shard points (N_s, 3), local pixel block (Pb, 3)/(Pb, C); after S-1
    ``ppermute`` hops every shard has folded every pixel block into its
    running top-k. Returns (d (N_s,k), xyz (N_s,k,3), feat (N_s,k,C)).
    Consumed by sharded_fusion_knn below and by the space-sharded whole-scene
    inference path (eval/sharded_scene.py).

    ``unroll=True`` replaces the ``fori_loop`` with a Python loop over the
    (static) ring length so the whole exchange is reverse-mode
    differentiable — gradients flow back through the gathered features and
    positions (``ppermute``/``take_along_axis`` both have transposes, but
    ``fori_loop`` lowers to ``while_loop`` which does not). The space-sharded
    TRAIN step (dist/train_sp.py) requires this; eval paths keep the rolled
    loop for compile-time economy at large ring sizes."""
    size = jax.lax.axis_size(axis)

    def local_knn(px, pf):
        d, idx = ops.knn(points[None], px[None], k)
        gx = ops.group_points(px[None], idx)
        gf = ops.group_points(pf[None], idx)
        return d[0], gx[0], gf[0]

    best = local_knn(pixel_xyz, pixel_feat)

    def step(i, carry):
        best, px, pf = carry
        # rotate the pixel block one hop around the ring
        perm = [(j, (j + 1) % size) for j in range(size)]
        px = jax.lax.ppermute(px, axis, perm)
        pf = jax.lax.ppermute(pf, axis, perm)
        cand = local_knn(px, pf)
        best = _merge_topk(best, cand, k)
        return best, px, pf

    carry = (best, pixel_xyz, pixel_feat)
    if unroll:
        for i in range(size - 1):
            carry = step(i, carry)
        best, _, _ = carry
    else:
        best, _, _ = jax.lax.fori_loop(0, size - 1, step, carry)
    return best


def sharded_fusion_knn(
    mesh: Mesh,
    points,
    pixel_xyz,
    pixel_feat,
    k: int,
):
    """Distributed kNN fusion gather.

    Args:
      mesh: mesh with a ``space`` axis.
      points: (N, 3) whole-scene points, sharded (or shardable) over space.
      pixel_xyz: (Ptot, 3) all shards' pixel positions, sharded over space.
      pixel_feat: (Ptot, C) matching features.
      k: neighbors.

    Returns:
      d (N, k), xyz (N, k, 3), feat (N, k, C) — each point's k nearest pixel
      neighbors across ALL shards, sharded over space like ``points``.
    """
    fn = jax.shard_map(
        functools.partial(ring_knn_local, k=k, axis=SPACE_AXIS),
        mesh=mesh,
        in_specs=(P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS)),
        out_specs=(P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS)),
        check_vma=False,  # Pallas calls inside (TPU path) carry no vma
    )
    return fn(points, pixel_xyz, pixel_feat)
