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

from mvpnet_tpu.ops import reference as _ref
from mvpnet_tpu.ops.reference import (  # noqa: F401
    group_points,
    pairwise_sqdist,
    three_nn_interpolate,
)

_impl = "auto"


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

    Inference-only (no gradient through the prepared path)."""
    from mvpnet_tpu.ops.pallas import knn_bucketed as pallas_knn_gated

    if isinstance(prepared, pallas_knn_gated.PreparedRefs):
        return pallas_knn_gated.knn_prepared(queries, prepared, k)
    return _ref.knn(queries, prepared.refs, k)


def farthest_point_sample(points, npoint: int, valid_mask=None, impl: str | None = None):
    """Farthest point sampling; see reference.farthest_point_sample."""
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import fps as pallas_fps

        if pallas_fps.supported(points, npoint):
            return pallas_fps.farthest_point_sample(points, npoint, valid_mask=valid_mask)
    return _ref.farthest_point_sample(points, npoint, valid_mask=valid_mask)


def ball_query(centers, points, radius: float, nsample: int, valid_mask=None, impl: str | None = None):
    """Fixed-K radius neighborhood; see reference.ball_query."""
    if _use_pallas(impl):
        from mvpnet_tpu.ops.pallas import ballquery as pallas_bq

        if pallas_bq.supported(centers, points, nsample):
            return pallas_bq.ball_query(centers, points, radius, nsample, valid_mask=valid_mask)
    return _ref.ball_query(centers, points, radius, nsample, valid_mask=valid_mask)
