"""Space-sharded whole-scene inference (the north-star SP production path).

The reference handles whole scenes by a single-device sliding-window loop
(mvpnet/test_3d.py, UNVERIFIED; SURVEY.md §3.2, §5 "Long-context" row — the
reference has NO parallel mode). This module is the TPU-native capability the
north star mandates instead: a whole-building scene evaluated across the
``space`` axis of the device mesh —

  * ONE view set is greedily selected for the whole scene (max point
    coverage) and split across space shards; each shard lifts + runs the 2D
    net over only its local views, so 2D compute and the pixel-feature cloud
    are both sharded;
  * chunk windows are sharded over space too; each chunk point's k nearest
    feature-pixels may live on any shard, so fusion runs the ring
    ``ppermute`` exchange (dist/fusion.ring_knn_local): S-1 hops rotate the
    pixel blocks around the ring while every shard folds them into a running
    top-k — communication overlaps compute, memory stays one block per hop;
  * each shard then runs FeatureAggregation + PN2SSG on its local chunks and
    the host scatter-accumulates the per-chunk logits.

Semantics note: the single-device mode (eval/whole_scene.py) selects ~5 views
PER CHUNK; this mode selects one scene-level view set, so every chunk fuses
against the full scene pixel cloud. The two are different estimators of the
same labels; the sharded mode is verified bit-equivalent to its own
single-device oracle (same view set, unsharded kNN) in tests/test_dist.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvpnet_tpu.config import Config
from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.data.pipeline import sample_chunk_points
from mvpnet_tpu.data.view_select import select_views_for_chunk
from mvpnet_tpu.dist.fusion import ring_knn_local
from mvpnet_tpu.dist.mesh import SPACE_AXIS


def select_scene_views(scene, num_views: int, *, max_score_points: int = 2048):
    """Greedy max-coverage view selection over the WHOLE scene point cloud
    (same algorithm the chunk pipeline uses per chunk, §3.4 semantics)."""
    return select_views_for_chunk(
        scene.points,
        scene.depth,
        scene.poses,
        scene.intrinsics,
        num_views,
        max_score_points=max_score_points,
        rng=None,
    )


def enumerate_scene_chunks(scene, cfg: Config):
    """Deterministic sliding chunk windows: list of (point_idx, points).

    Same window grid + point sampling as the single-device path
    (whole_scene.enumerate_chunk_centers + pipeline.sample_chunk_points with
    rng=None), factored out so the sharded path and its parity oracle iterate
    identical chunks.
    """
    from mvpnet_tpu.eval.whole_scene import enumerate_chunk_centers

    centers = enumerate_chunk_centers(
        scene.points, cfg.data.chunk_size, cfg.data.chunk_stride
    )
    half = cfg.data.chunk_size / 2 + cfg.data.chunk_margin
    chunks = []
    for center in centers:
        near = np.abs(scene.points[:, :2] - center)
        if not np.any((near[:, 0] <= half) & (near[:, 1] <= half)):
            continue
        sel = sample_chunk_points(
            scene, center, cfg.data.num_points, cfg.data.chunk_size,
            cfg.data.chunk_margin, rng=None,
        )
        chunks.append((sel.astype(np.int64), scene.points[sel].astype(np.float32)))
    return chunks


def build_sharded_scene_fns(model, cfg: Config, mesh: Mesh):
    """Jitted (pixel_fn, fuse_fn) over the mesh's space axis.

    pixel_fn(state, images (Vt,H,W,3), depth (Vt,H,W), poses (Vt,4,4),
             intrinsics (3,3)) -> pixel_xyz (Vt*H*W, 3), pixel_feat
             (Vt*H*W, C2d) — both sharded over space (each shard computes its
             local views' lift + 2D features; zero cross-shard traffic).
    fuse_fn(state, chunk_pts (G,N,3), pixel_xyz, pixel_feat)
             -> logits (G,N,num_classes) — ring fusion + local PN2SSG.
    """
    model.eval()
    graphdef, state = nnx.split(model)
    k = cfg.model.aggregation.k

    def _pixel_body(state, images, depth, poses, intrinsics):
        m = nnx.merge(graphdef, state)
        xyz, _ = unproject_views(depth, intrinsics, poses)  # (Vl,H,W,3)
        feat, _ = m.net_2d(images)  # (Vl,H,W,C2d)
        vl, h, w, c = feat.shape
        return xyz.reshape(vl * h * w, 3), feat.reshape(vl * h * w, c)

    def _fuse_body(state, chunk_pts, pixel_xyz, pixel_feat):
        m = nnx.merge(graphdef, state)
        gl, n, _ = chunk_pts.shape
        flat = chunk_pts.reshape(gl * n, 3)
        _, gxyz, gfeat = ring_knn_local(
            flat, pixel_xyz, pixel_feat, k=k, axis=SPACE_AXIS
        )
        gxyz = gxyz.reshape(gl, n, k, 3)
        gfeat = gfeat.reshape(gl, n, k, gfeat.shape[-1])
        fused = m.aggregation(chunk_pts, gxyz, gfeat)
        return m.net_3d(chunk_pts, fused)  # (Gl, N, num_classes)

    pixel_fn = jax.jit(
        jax.shard_map(
            _pixel_body,
            mesh=mesh,
            in_specs=(P(), P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS), P()),
            out_specs=(P(SPACE_AXIS), P(SPACE_AXIS)),
            check_vma=False,  # Pallas calls inside (TPU path) carry no vma
        )
    )
    fuse_fn = jax.jit(
        jax.shard_map(
            _fuse_body,
            mesh=mesh,
            in_specs=(P(), P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS)),
            out_specs=P(SPACE_AXIS),
            check_vma=False,  # Pallas calls inside (TPU path) carry no vma
        )
    )
    return state, pixel_fn, fuse_fn


def _pad_views(images, depth, poses, multiple: int):
    """Pad the view axis to a multiple of the shard count with depth-0 frames
    (every pixel invalid -> sentinel position, so padding never wins a kNN)."""
    v = len(depth)
    pad = (-v) % multiple
    if pad == 0:
        return images, depth, poses
    images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
    depth = np.concatenate([depth, np.zeros((pad,) + depth.shape[1:], depth.dtype)])
    eye = np.tile(np.eye(4, dtype=poses.dtype), (pad, 1, 1))
    poses = np.concatenate([poses, eye])
    return images, depth, poses


def predict_scene_sharded(
    model,
    cfg: Config,
    scene,
    mesh: Mesh,
    *,
    num_views: int | None = None,
    chunks_per_shard: int | None = None,
    fns=None,
) -> np.ndarray:
    """Accumulated per-point logits (P, num_classes), space-sharded execution.

    ``fns`` (from build_sharded_scene_fns) can be passed to reuse compiled
    functions across scenes.
    """
    S = mesh.shape[SPACE_AXIS]
    vt = num_views or cfg.eval.scene_views
    vt = min(vt, len(scene.depth))
    gshard = chunks_per_shard or cfg.eval.chunks_per_shard
    G = gshard * S  # global chunks per fusion pass

    state, pixel_fn, fuse_fn = fns or build_sharded_scene_fns(model, cfg, mesh)

    frames = select_scene_views(scene, vt)
    images, depth, poses = _pad_views(
        scene.rgb[frames].astype(np.float32),
        scene.depth[frames].astype(np.float32),
        scene.poses[frames].astype(np.float32),
        S,
    )
    space_sharding = NamedSharding(mesh, P(SPACE_AXIS))
    repl = NamedSharding(mesh, P())
    pixel_xyz, pixel_feat = pixel_fn(
        jax.device_put(state, repl),
        jax.device_put(images, space_sharding),
        jax.device_put(depth, space_sharding),
        jax.device_put(poses, space_sharding),
        jax.device_put(scene.intrinsics.astype(np.float32), repl),
    )

    chunks = enumerate_scene_chunks(scene, cfg)
    logits_acc = np.zeros((len(scene.points), cfg.data.num_classes), np.float32)
    counts = np.zeros(len(scene.points), np.int32)
    if not chunks:  # degenerate/empty scene: all points NN-filled (= zeros)
        from mvpnet_tpu.eval.whole_scene import nn_fill_uncovered

        nn_fill_uncovered(scene.points, logits_acc, counts)
        return logits_acc
    state_repl = jax.device_put(state, repl)

    for start in range(0, len(chunks), G):
        group = chunks[start : start + G]
        n_real = len(group)
        while len(group) < G:  # pad to the compiled group shape
            group.append(group[-1])
        pts = np.stack([g[1] for g in group])  # (G, N, 3)
        logits = np.asarray(
            fuse_fn(
                state_repl,
                jax.device_put(pts, space_sharding),
                pixel_xyz,
                pixel_feat,
            ),
            dtype=np.float32,
        )
        for i in range(n_real):
            sel = group[i][0]
            np.add.at(logits_acc, sel, logits[i])
            np.add.at(counts, sel, 1)

    from mvpnet_tpu.eval.whole_scene import nn_fill_uncovered

    nn_fill_uncovered(scene.points, logits_acc, counts)
    return logits_acc
