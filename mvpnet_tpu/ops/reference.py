"""Pure-jnp reference implementations of the point-cloud ops.

TPU-native equivalents of the reference's CUDA extension ops under
``mvpnet/ops/`` (UNVERIFIED paths; op semantics are the canonical PointNet++
kernels, [C] — SURVEY.md §2.1):

  farthest_point_sample  <-  sample_farthest_points.cu
  ball_query             <-  ball_query.cu
  group_points           <-  group_points.cu (+ hand-written scatter-add grad)
  knn                    <-  knn_distance.cu
  three_nn_interpolate   <-  interpolate.cu (+ grad)

Differences by design (TPU-first, not a port):
  * channels-last: features are (B, N, C) not (B, C, N).
  * fixed shapes + masks: invalid reference points carry +inf distance; ball
    query pads with the first in-radius hit (canonical CUDA behavior) and
    falls back to the nearest point when the ball is empty (deterministic,
    strictly-defined where the CUDA kernel left memory uninitialized).
  * gradients come from JAX AD through gathers (no hand-written backward);
    XLA emits the scatter-add that the reference wrote by hand.

These serve as correctness oracles for the Pallas kernels in
``mvpnet_tpu/ops/pallas`` and as the fallback path on CPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


def pairwise_sqdist(a, b):
    """Squared Euclidean distances between two point sets.

    Args:
      a: (..., M, 3)
      b: (..., N, 3)
    Returns:
      (..., M, N) float32 squared distances.

    Uses the |a|^2 - 2ab + |b|^2 expansion so the cross term rides the MXU.
    Computed in float32 regardless of input dtype (distance ordering must be
    exact for index-op parity).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., M, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., N, 1)
    # HIGHEST precision: the TPU MXU's default bf16-passes precision perturbs
    # distance ordering and breaks index parity with exact (a-b)^2 kernels.
    cross = jnp.einsum(
        "...mc,...nc->...mn", a, b, precision=jax.lax.Precision.HIGHEST
    )
    d2 = a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


# ---------------------------------------------------------------------------
# Farthest point sampling
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(points, npoint: int, valid_mask=None):
    """Iteratively select ``npoint`` centroid indices maximizing min-distance.

    Exact semantics of the canonical CUDA kernel (seeded at index 0; ties
    broken by lowest index via argmax-first-occurrence). Replaces
    mvpnet/ops/sample_farthest_points (UNVERIFIED; SURVEY.md §2.1 row 1).
    Masked extension: the seed is the FIRST VALID index (= 0 when unmasked or
    when point 0 is valid), so the "invalid points are never selected"
    contract holds at the seed too (round-3 VERDICT weak #6).

    Args:
      points: (B, N, 3).
      npoint: number of samples (static).
      valid_mask: optional (B, N) bool; invalid points are never selected.

    Returns:
      (B, npoint) int32 indices.
    """
    B, N, _ = points.shape
    pts = points.astype(jnp.float32)
    # Derive the scan-carry inits from ``pts`` (instead of fresh constants) so
    # they inherit its device-varying type under shard_map manual axes — the
    # scan body makes the carry varying, and jax requires init/body type
    # agreement. XLA constant-folds the *0 away; outside shard_map this is
    # identical to jnp.full/zeros.
    zeros = pts[..., 0] * 0.0  # (B, N)
    if valid_mask is None:
        start_dist = zeros + _INF
        neg_inf_mask = zeros
    else:
        # invalid points: distance track pinned to -inf so argmax skips them
        neg_inf_mask = zeros + jnp.where(valid_mask, 0.0, -_INF)
        start_dist = zeros + jnp.where(valid_mask, _INF, -_INF)

    def body(carry, _):
        dist, last_idx = carry
        last_xyz = jnp.take_along_axis(pts, last_idx[:, None, None], axis=1)
        d2 = jnp.sum((pts - last_xyz) ** 2, axis=-1)
        dist = jnp.minimum(dist, d2 + neg_inf_mask)
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return (dist, nxt), nxt

    if valid_mask is None:
        first = (zeros[:, 0]).astype(jnp.int32)  # index 0, varying like pts
    else:
        # first valid index per row (argmax returns the first True)
        first = jnp.argmax(valid_mask, axis=-1).astype(jnp.int32) + (
            zeros[:, 0]
        ).astype(jnp.int32)
    if npoint == 1:
        return first[:, None]
    (_, _), rest = jax.lax.scan(
        body, (start_dist, first), None, length=npoint - 1
    )
    return jnp.concatenate([first[:, None], rest.T], axis=1)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(centers, points, radius: float, nsample: int, valid_mask=None):
    """Indices of up to ``nsample`` points within ``radius`` of each center.

    Canonical CUDA semantics (mvpnet/ops/ball_query UNVERIFIED; SURVEY.md
    §2.1 row 2): scan points in index order, keep the first ``nsample`` hits,
    pad by repeating the first hit. Deterministic extension: an empty ball
    falls back to the nearest point (the reference leaves those rows
    undefined; FPS centers always contain themselves, so this only fires for
    padded/invalid centers).

    Args:
      centers: (B, M, 3).
      points: (B, N, 3).
      radius: ball radius (static or traced float).
      nsample: K, number of neighbors returned (static).
      valid_mask: optional (B, N) bool of usable points.

    Returns:
      idx: (B, M, K) int32.
      count: (B, M) int32 number of in-radius hits (0..K), for mask-aware
        consumers.
    """
    B, M, _ = centers.shape
    N = points.shape[1]
    d2 = pairwise_sqdist(centers, points)  # (B, M, N)
    if valid_mask is not None:
        d2 = jnp.where(valid_mask[:, None, :], d2, _INF)
    in_ball = d2 < radius * radius  # (B, M, N)

    # Pick the K lowest-index hits: key = N - j for hits (so the largest keys
    # are the earliest indices), -1 for misses; top_k is then exactly
    # "first K in index order".
    j = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(in_ball, N - j, -1)  # (B, M, N) int32
    topv, topi = jax.lax.top_k(key, nsample)  # (B, M, K)
    hit = topv > 0
    count = jnp.sum(hit, axis=-1).astype(jnp.int32)

    first = topi[..., :1]  # first in-radius index (or garbage if count==0)
    nearest = jnp.argmin(d2, axis=-1, keepdims=True).astype(jnp.int32)
    first = jnp.where(count[..., None] > 0, first, nearest)
    idx = jnp.where(hit, topi, first)
    return idx.astype(jnp.int32), count


# ---------------------------------------------------------------------------
# Grouping
# ---------------------------------------------------------------------------


def group_points(features, idx):
    """Gather features by neighbor index: (B, N, C), (B, M, K) -> (B, M, K, C).

    Replaces mvpnet/ops/group_points (UNVERIFIED; SURVEY.md §2.1 row 3). The
    backward scatter-add the reference hand-writes falls out of JAX AD.
    """
    B, M, K = idx.shape
    flat = idx.reshape(B, M * K)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, K, features.shape[-1])


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k",))
def knn(queries, refs, k: int, ref_mask=None):
    """Brute-force k nearest neighbors.

    Replaces mvpnet/ops/knn_distance (UNVERIFIED; SURVEY.md §2.1 row 4) AND
    the dataset's CPU KDTree kNN (scannet_2d3d.py §3.4) — on TPU the fusion
    kNN runs on-device.

    Args:
      queries: (B, M, 3).
      refs: (B, N, 3).
      k: neighbor count (static).
      ref_mask: optional (B, N) bool; invalid refs get +inf distance.

    Returns:
      dists: (B, M, k) squared distances (float32), ascending.
      idx: (B, M, k) int32 indices into refs.
    """
    d2 = pairwise_sqdist(queries, refs)
    if ref_mask is not None:
        d2 = jnp.where(ref_mask[:, None, :], d2, _INF)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Three-NN interpolation
# ---------------------------------------------------------------------------


def three_nn_interpolate(dense_xyz, sparse_xyz, sparse_feat, eps: float = 1e-8):
    """Inverse-distance-weighted 3-NN feature upsampling.

    Replaces mvpnet/ops/interpolate (UNVERIFIED; SURVEY.md §2.1 row 5):
    weights w_i = (1/(d_i^2+eps)) / sum_j 1/(d_j^2+eps); backward is JAX AD.

    Args:
      dense_xyz: (B, N, 3) positions to interpolate onto.
      sparse_xyz: (B, S, 3) positions carrying features.
      sparse_feat: (B, S, C).

    Returns:
      (B, N, C) interpolated features.
    """
    d2, idx = knn(dense_xyz, sparse_xyz, 3)
    w = 1.0 / (d2 + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)  # (B, N, 3)
    neigh = group_points(sparse_feat, idx)  # (B, N, 3, C)
    return jnp.sum(neigh * w[..., None].astype(neigh.dtype), axis=2)
