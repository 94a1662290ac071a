"""Point-cloud ops: public API with implementation dispatch.

Every op has two interchangeable implementations behind one signature:
  * ``reference`` — pure jnp (mvpnet_tpu/ops/reference.py), the correctness
    oracle; runs everywhere (CPU tests, interpret mode).
  * ``pallas`` — hand-written TPU kernels (mvpnet_tpu/ops/pallas/), the
    production path for the hot ops (kNN, FPS, ball query).

Dispatch: ``set_impl("auto"|"reference"|"pallas")`` or per-call ``impl=``.
"auto" selects pallas on TPU backends when the op has a kernel, else the
reference. This mirrors how the reference repo gates its CUDA extension
(mvpnet/ops/*.py wrappers, UNVERIFIED — SURVEY.md §2.1) but with a correct
CPU fallback instead of a hard CUDA requirement.
"""
from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as _P

from mvpnet_tpu.ops import reference as _ref
from mvpnet_tpu.ops.reference import (  # noqa: F401
    group_points,
    pairwise_sqdist,
)

_impl = "auto"

# ---------------------------------------------------------------------------
# Batch-locality under a device mesh.
#
# Every op here is pure and BATCH-LOCAL (row b of every output depends only
# on row b of every input), but XLA's SPMD partitioner cannot prove that for
# top_k/sort (and treats Pallas custom calls as opaque): compiling the DP
# train step on an 8-device mesh, it ALL-GATHERS the fusion-kNN distance
# matrix and the ball-query key matrices — 15.7 GB/step at config-#2 shapes,
# 250 GB at config #3 (runs/r4_comm_model.json, round 4). Installing the
# active mesh here lets the ops pin themselves to shards with shard_map:
# explicit batch locality, zero collectives, and the Pallas kernels see
# per-shard batches (smaller VMEM footprints) instead of a gathered batch.
# ---------------------------------------------------------------------------

_data_mesh = None


def set_data_mesh(mesh) -> None:
    """Install (or clear, with None) the active mesh for batch-local ops.

    Called by the train loop / graft entry when running under a mesh. Ops
    invoked INSIDE an existing shard_map (e.g. the space-axis ring fusion,
    dist/fusion.ring_knn_local) are left untouched — detected via the
    ambient AbstractMesh's manual axes."""
    global _data_mesh
    _data_mesh = mesh


def _batch_axes(B: int):
    """Mesh axis names to shard the batch dim over, or None to run as-is."""
    mesh = _data_mesh
    if mesh is None:
        return None
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and getattr(am, "manual_axes", ()):
            return None  # already inside shard_map: axes are manual
    except Exception:
        return None
    ndev = mesh.devices.size
    if ndev > 1 and B % ndev == 0:
        return tuple(mesh.axis_names)
    dsize = dict(mesh.shape).get("data", 1)
    if dsize > 1 and B % dsize == 0:
        return ("data",)
    return None


def _batch_local(fn, *arrays):
    """Run pure batch-local ``fn(*arrays)`` shard-mapped over the batch dim
    when a mesh is installed and the batch divides it; plain call otherwise.
    ``out_specs`` is a prefix spec: every output leaf is batch-sharded."""
    axes = _batch_axes(arrays[0].shape[0])
    if axes is None:
        return fn(*arrays)
    spec = _P(axes)
    return jax.shard_map(
        fn,
        mesh=_data_mesh,
        in_specs=tuple(spec for _ in arrays),
        out_specs=spec,
        # Pallas calls inside (the TPU path) emit outputs without vma
        # metadata, which JAX 0.9's default check_vma=True rejects — found
        # by the real-chip sharded-eval smoke drive (CPU tests dispatch to
        # the jnp reference and never hit it)
        check_vma=False,
    )(*arrays)


def set_impl(name: str) -> None:
    global _impl
    if name not in ("auto", "reference", "pallas"):
        raise ValueError(f"unknown ops impl {name!r}")
    _impl = name


def get_impl() -> str:
    return _impl


def _use_pallas(impl: str | None) -> bool:
    mode = impl or _impl
    if mode == "reference":
        return False
    if mode == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _knn_dispatch(queries, refs, k, ref_mask, impl, refs_coherent):
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import knn as pallas_knn
        from mvpnet_tpu.ops.pallas import knn_bucketed as pallas_knn_gated

        # large ref clouds (fusion pixel sets, whole-scene): Morton-sorted,
        # program-level bound-gated kernel skips most tile work at one
        # scalar branch per tile (see ops/pallas/knn_bucketed.py)
        if pallas_knn_gated.supported(queries, refs, k):
            return pallas_knn_gated.knn(
                queries, refs, k, ref_mask=ref_mask, refs_coherent=refs_coherent
            )
        if pallas_knn.supported(queries, refs, k):
            return pallas_knn.knn(queries, refs, k, ref_mask=ref_mask)
    return _ref.knn(queries, refs, k, ref_mask=ref_mask)


def knn(
    queries,
    refs,
    k: int,
    ref_mask=None,
    impl: str | None = None,
    refs_coherent: bool = False,
):
    """k nearest neighbors; see reference.knn for contract.

    ``refs_coherent=True`` tells the gated kernel the refs are already
    spatially coherent in memory order (scanline pixel clouds): it skips
    its ref-side Morton sort/gather — a speed hint only, results identical.
    (The production fusion path does NOT set it: measured 26.8 vs 15.4 ms
    at B4 fusion scale — runs/r4_fusion_knn_ab.json.)

    Coordinate-magnitude contract (gated kernel): REAL coordinates must
    satisfy ``|coord| < 1e5`` — values at/above that are treated as
    invalid-point sentinels (unproject fill 1e6, mask fill 1e9, pad 3e9)
    and excluded from the kernel's pruning bounds, so a legitimately
    huge-magnitude ref (e.g. unscaled millimeter data) could be pruned
    away. Scale such data to meters first (the pipeline already does).
    """
    if ref_mask is None:
        return _batch_local(
            lambda q, r: _knn_dispatch(q, r, k, None, impl, refs_coherent),
            queries,
            refs,
        )
    return _batch_local(
        lambda q, r, m: _knn_dispatch(q, r, k, m, impl, refs_coherent),
        queries,
        refs,
        ref_mask,
    )


@jax.tree_util.register_pytree_node_class
class RawRefs:
    """Fallback knn_prepare() result: the refs verbatim (jit-crossable)."""

    def __init__(self, refs):
        self.refs = refs

    def tree_flatten(self):
        return (self.refs,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def knn_prepare(refs, impl: str | None = None):
    """Prepare a ref cloud once for many knn_prepared() queries.

    Whole-scene consumers (eval/scene_fused.py, BASELINE config #4) reuse
    one prepared scene pixel cloud across every chunk window, amortizing the
    ref-side Morton sort + tile bounds (the dominant per-call prep at 1.23M
    refs — docs/PERF_NOTES.md round 3). On non-TPU backends (or tiny ref
    clouds) this returns the raw refs and knn_prepared falls back to the
    reference brute kNN.
    """
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import knn_bucketed as pallas_knn_gated

        if refs.ndim == 3 and refs.shape[-1] == 3 and refs.shape[1] >= pallas_knn_gated._MIN_N:
            return pallas_knn_gated.prepare_refs(refs)
    return RawRefs(refs)


def knn_prepared(queries, prepared, k: int, impl: str | None = None):
    """kNN against a knn_prepare() result; contract of reference.knn.

    Differentiable: distance cotangents flow to the queries and — through
    prepare_refs()'s jnp sort/gather — to the underlying refs (custom VJP in
    ops/pallas/knn_bucketed.py; grad-parity-tested against the reference
    kNN), so scene-level fine-tuning can train through the prepared path."""
    from mvpnet_tpu.ops.pallas import knn_bucketed as pallas_knn_gated

    if isinstance(prepared, pallas_knn_gated.PreparedRefs):
        return pallas_knn_gated.knn_prepared(queries, prepared, k)
    return _ref.knn(queries, prepared.refs, k)


def _fps_dispatch(points, npoint, valid_mask, impl):
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import fps as pallas_fps

        if pallas_fps.supported(points, npoint):
            return pallas_fps.farthest_point_sample(points, npoint, valid_mask=valid_mask)
    return _ref.farthest_point_sample(points, npoint, valid_mask=valid_mask)


def farthest_point_sample(points, npoint: int, valid_mask=None, impl: str | None = None):
    """Farthest point sampling; see reference.farthest_point_sample."""
    if valid_mask is None:
        return _batch_local(lambda p: _fps_dispatch(p, npoint, None, impl), points)
    return _batch_local(
        lambda p, m: _fps_dispatch(p, npoint, m, impl), points, valid_mask
    )


def _ball_query_dispatch(centers, points, radius, nsample, valid_mask, impl):
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import ballquery as pallas_bq

        if pallas_bq.supported(centers, points, nsample):
            return pallas_bq.ball_query(centers, points, radius, nsample, valid_mask=valid_mask)
    return _ref.ball_query(centers, points, radius, nsample, valid_mask=valid_mask)


def ball_query(centers, points, radius: float, nsample: int, valid_mask=None, impl: str | None = None):
    """Fixed-K radius neighborhood; see reference.ball_query."""
    if valid_mask is None:
        return _batch_local(
            lambda c, p: _ball_query_dispatch(c, p, radius, nsample, None, impl),
            centers,
            points,
        )
    return _batch_local(
        lambda c, p, m: _ball_query_dispatch(c, p, radius, nsample, m, impl),
        centers,
        points,
        valid_mask,
    )


def three_nn_interpolate(dense_xyz, sparse_xyz, sparse_feat, eps: float = 1e-8, impl: str | None = None):
    """Inverse-distance-weighted 3-NN upsampling (reference contract).

    The 3-NN search goes through the DISPATCHED kNN (Pallas on TPU): the
    reference jnp path materializes the dense x sparse distance matrix and
    runs XLA top_k over it — 600+ ms for the 102400 x 8192 FP1 stage of
    config #4, where the tiled kernel does the same in ~10 ms (the round-4
    net3d decomposition, docs/PERF_NOTES.md)."""

    def body(d, s, f):
        import jax.numpy as jnp

        d2, idx = _knn_dispatch(d, s, 3, None, impl, False)
        w = 1.0 / (d2 + eps)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        neigh = _ref.group_points(f, idx)
        return jnp.sum(neigh * w[..., None].astype(neigh.dtype), axis=2)

    return _batch_local(body, dense_xyz, sparse_xyz, sparse_feat)
