"""Distributed-level tests on the 8-device virtual CPU mesh (SURVEY.md §4
item 4): mesh sharding, ring fusion vs unsharded oracle, DP train step."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from mvpnet_tpu import ops
from mvpnet_tpu.config import MeshConfig
from mvpnet_tpu.dist.fusion import sharded_fusion_knn
from mvpnet_tpu.dist.mesh import DATA_AXIS, SPACE_AXIS, make_mesh, shard_batch


def test_make_mesh_shapes(devices):
    mesh = make_mesh(MeshConfig(data=-1, space=2))
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[SPACE_AXIS] == 2
    mesh = make_mesh(MeshConfig(data=8, space=1))
    assert mesh.shape[DATA_AXIS] == 8


@pytest.mark.parametrize("space", [2, 4, 8])
def test_ring_fusion_matches_unsharded(rng, devices, space):
    mesh = make_mesh(MeshConfig(data=8 // space, space=space))
    N, Ptot, C, k = 64 * space, 128 * space, 6, 3
    points = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    pixel_xyz = rng.uniform(-2, 2, (Ptot, 3)).astype(np.float32)
    pixel_feat = rng.normal(size=(Ptot, C)).astype(np.float32)

    d, xyz, feat = sharded_fusion_knn(
        mesh,
        jnp.asarray(points),
        jnp.asarray(pixel_xyz),
        jnp.asarray(pixel_feat),
        k,
    )
    # unsharded oracle
    d_want, idx = ops.knn(jnp.asarray(points)[None], jnp.asarray(pixel_xyz)[None], k)
    xyz_want = ops.group_points(jnp.asarray(pixel_xyz)[None], idx)[0]
    feat_want = ops.group_points(jnp.asarray(pixel_feat)[None], idx)[0]
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_want)[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(xyz_want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_want), atol=1e-5)


def test_shard_batch_layout(rng, devices):
    mesh = make_mesh(MeshConfig(data=8, space=1))
    batch = {
        "points": rng.normal(size=(8, 32, 3)).astype(np.float32),
        "intrinsics": rng.normal(size=(3, 3)).astype(np.float32),
    }
    sharded = shard_batch(mesh, batch)
    assert sharded["points"].sharding.spec == P(DATA_AXIS)
    np.testing.assert_allclose(np.asarray(sharded["points"]), batch["points"])


def test_dp_train_step_matches_single_device(rng, devices):
    """Data-parallel jitted step on the mesh must match single-device math."""
    import optax
    from tests.test_models import tiny_config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, augment=False)
    )
    B, V, H, W, N = 8, 2, 8, 8, 32
    batch_np = {
        "points": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "seg_label": rng.integers(0, 5, (B, N)).astype(np.int32),
        "images": rng.uniform(size=(B, V, H, W, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 2, (B, V, H, W)).astype(np.float32),
        "poses": np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1)),
        "intrinsics": np.tile(np.eye(3, dtype=np.float32) * 8, (B, 1, 1)),
        "seg_label_2d": rng.integers(0, 5, (B, V, H, W)).astype(np.int32),
    }

    def run(device_batch):
        model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
        optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
        step = make_train_step(cfg, loss_fn, metric_fn)
        key = jax.random.key(0)
        m = step(model, optimizer, device_batch, key)
        return float(m["loss"])

    loss_single = run(jax.device_put(batch_np))
    mesh = make_mesh(MeshConfig(data=8, space=1))
    loss_dp = run(shard_batch(mesh, batch_np))
    assert np.isfinite(loss_dp)
    np.testing.assert_allclose(loss_dp, loss_single, rtol=2e-4)


def test_train_loop_on_mesh(tmp_path, devices):
    """Full train() wiring on the 8-device mesh: bootstrap no-op, replicated
    params, data-sharded batches from the prefetcher, primary-gated outputs."""
    from tests.test_models import tiny_config
    from mvpnet_tpu.train.loop import train

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            num_points=64,
            num_views_train=2,
            num_views_eval=2,
            image_height=16,
            image_width=16,
            num_workers=2,
            max_candidate_frames=4,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=8,
            max_steps=2,
            log_every=1,
            val_every=2,
            val_steps=1,
            ckpt_every=2,
            donate=False,
        ),
        mesh=MeshConfig(data=8, space=1),
        output_dir=str(tmp_path),
    )
    model, val_metrics = train(cfg, resume=False)
    assert np.isfinite(val_metrics["loss"])
    # params must land replicated over the mesh
    leaf = jax.tree_util.tree_leaves(nnx.state(model, nnx.Param))[0]
    assert len(leaf.sharding.device_set) == 8
    assert (tmp_path / "config.yaml").exists()


@pytest.mark.parametrize("space", [2, 4])
def test_sp_train_step_grad_parity(rng, devices, space):
    """Space-sharded training (view/point/pixel axes over ``space``, ring
    fusion inside the standard jitted step) must produce the same loss,
    updated params, batch stats, and confusion matrix as the unsharded step
    on the same global batch (round-2 VERDICT next #3)."""
    from tests.test_models import tiny_config
    from mvpnet_tpu.dist.train_sp import install_space_fusion, shard_batch_sp
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, augment=True),
        train=dataclasses.replace(cfg.train, donate=False),
        # SGD: the update is linear in the gradient, so float-reorder noise
        # stays ~1e-6. (Adam's first-step update is ~sign(g)*lr — a near-zero
        # gradient element can flip sign under reordering and move 2*lr.)
        solver=dataclasses.replace(cfg.solver, optimizer="sgd", momentum=0.0),
    )
    B, V, H, W, N = 8, 4, 8, 8, 64
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[..., :3, 3] = rng.uniform(-1, 1, (B, V, 3))
    batch_np = {
        "points": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "seg_label": rng.integers(0, 5, (B, N)).astype(np.int32),
        "images": rng.uniform(size=(B, V, H, W, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 2, (B, V, H, W)).astype(np.float32),
        "poses": poses,
        "intrinsics": np.tile(np.eye(3, dtype=np.float32) * 8, (B, 1, 1)),
        "seg_label_2d": rng.integers(0, 5, (B, V, H, W)).astype(np.int32),
    }
    key = jax.random.key(7)

    def run(model_setup, device_batch):
        model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
        model_setup(model)
        opt = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
        step = make_train_step(cfg, loss_fn, metric_fn)
        m = step(model, opt, device_batch, key)
        return model, m

    model_u, m_u = run(lambda m: m, jax.device_put(batch_np))

    mesh = make_mesh(MeshConfig(data=8 // space, space=space))
    model_s, m_s = run(
        lambda m: install_space_fusion(m, mesh), shard_batch_sp(mesh, batch_np)
    )

    np.testing.assert_allclose(float(m_s["loss"]), float(m_u["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_s["accuracy"]), float(m_u["accuracy"]), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(m_s["confusion"]), np.asarray(m_u["confusion"])
    )
    for col in (nnx.Param, nnx.BatchStat):
        tu = jax.tree.leaves(jax.tree.map(np.asarray, nnx.state(model_u, col)))
        ts = jax.tree.leaves(jax.tree.map(np.asarray, nnx.state(model_s, col)))
        assert len(tu) == len(ts) and len(tu) > 0
        for a, b in zip(tu, ts):
            np.testing.assert_allclose(a, b, atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("space", [2, 8])
def test_sharded_scene_matches_single_device_oracle(devices, space):
    """The space-sharded whole-scene path (sharded 2D + ring fusion + local
    PN2SSG) must produce the same accumulated scene logits as a straight
    single-device implementation using the same scene-level view set."""
    from mvpnet_tpu.config import EvalConfig
    from mvpnet_tpu.core.camera import unproject_views
    from mvpnet_tpu.data.synthetic import make_scene
    from mvpnet_tpu.eval.sharded_scene import (
        enumerate_scene_chunks,
        predict_scene_sharded,
        select_scene_views,
    )
    from mvpnet_tpu.eval.whole_scene import nn_fill_uncovered
    from mvpnet_tpu.models import build_model
    from tests.test_models import tiny_config
    from tests.test_pipeline import small_data_cfg

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=small_data_cfg(num_points=128, chunk_size=2.0, chunk_stride=1.5),
        eval=EvalConfig(scene_views=4, chunks_per_shard=1),
    )
    scene = make_scene(3, num_points=12000, num_frames=6, height=16, width=24, num_classes=5)
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()

    mesh = make_mesh(MeshConfig(data=8 // space, space=space))
    got = predict_scene_sharded(model, cfg, scene, mesh)

    # single-device oracle: same view set + chunk windows, unsharded math
    frames = select_scene_views(scene, cfg.eval.scene_views)
    xyz, _ = unproject_views(
        jnp.asarray(scene.depth[frames]),
        jnp.asarray(scene.intrinsics),
        jnp.asarray(scene.poses[frames]),
    )
    feat, _ = model.net_2d(jnp.asarray(scene.rgb[frames]))
    pixel_xyz = xyz.reshape(1, -1, 3)
    pixel_feat = feat.reshape(1, pixel_xyz.shape[1], -1)
    k = cfg.model.aggregation.k

    acc = np.zeros((len(scene.points), cfg.data.num_classes), np.float32)
    counts = np.zeros(len(scene.points), np.int32)
    for sel, pts in enumerate_scene_chunks(scene, cfg):
        ptsj = jnp.asarray(pts)[None]
        _, idx = ops.knn(ptsj, pixel_xyz, k)
        gxyz = ops.group_points(pixel_xyz, idx)
        gfeat = ops.group_points(pixel_feat, idx)
        fused = model.aggregation(ptsj, gxyz, gfeat)
        logits = np.asarray(model.net_3d(ptsj, fused)[0], np.float32)
        np.add.at(acc, sel, logits)
        np.add.at(counts, sel, 1)
    nn_fill_uncovered(scene.points, acc, counts)

    np.testing.assert_allclose(got, acc, atol=2e-4, rtol=1e-4)


def test_batch_local_ops_match_unmeshed(devices, rng):
    """ops.set_data_mesh pins the index ops batch-local via shard_map (the
    partitioner otherwise all-gathers their top_k operands — 15.7 GB/step
    at config-#2 DP, runs/r4_comm_model.json). Results must be identical
    to the unmeshed path, and non-divisible batches must fall through."""
    from mvpnet_tpu import ops

    pts = jnp.asarray(rng.uniform(-2, 2, (8, 256, 3)).astype(np.float32))
    refs = jnp.asarray(rng.uniform(-2, 2, (8, 512, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(8, 64, 16)).astype(np.float32))
    sparse = refs[:, :64]

    def run_all():
        return {
            "knn": ops.knn(pts, refs, 3),
            "fps": ops.farthest_point_sample(pts, 32),
            "bq": ops.ball_query(pts[:, :32], pts, 0.4, 8),
            "tnn": ops.three_nn_interpolate(pts, sparse, feat),
        }

    odd = pts[:3]
    ops.set_data_mesh(None)
    want = jax.tree.map(np.asarray, run_all())
    want_odd = np.asarray(ops.farthest_point_sample(odd, 16))
    mesh = make_mesh(MeshConfig(data=4, space=2))
    try:
        ops.set_data_mesh(mesh)
        got = jax.tree.map(np.asarray, run_all())
        # sharded outputs land distributed; values must be identical
        for k in want:
            jax.tree.map(np.testing.assert_array_equal, got[k], want[k])
        # non-divisible batch: guard must fall through to the plain path
        np.testing.assert_array_equal(
            np.asarray(ops.farthest_point_sample(odd, 16)), want_odd
        )
    finally:
        ops.set_data_mesh(None)


def test_scene_fused_matches_sharded_estimator(devices):
    """eval/scene_fused.py (single-device scene-view-set mode with a
    prepared pixel cloud) is estimator-EQUIVALENT to the space-sharded
    whole-scene path: same view set, same chunk windows, same fusion
    against the full scene cloud — so the sharded mIoU can be quoted
    against a single-device number 1:1 (round-3 VERDICT weak #7 / next #5)."""
    from mvpnet_tpu.config import EvalConfig
    from mvpnet_tpu.data.synthetic import make_scene
    from mvpnet_tpu.eval.scene_fused import predict_scene_fused
    from mvpnet_tpu.eval.sharded_scene import predict_scene_sharded
    from mvpnet_tpu.models import build_model
    from tests.test_models import tiny_config
    from tests.test_pipeline import small_data_cfg

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=small_data_cfg(num_points=128, chunk_size=2.0, chunk_stride=1.5),
        eval=EvalConfig(scene_views=4, chunks_per_shard=1, batch_size=2),
    )
    scene = make_scene(
        5, num_points=12000, num_frames=6, height=16, width=24, num_classes=5
    )
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()

    mesh = make_mesh(MeshConfig(data=4, space=2))
    got_sharded = predict_scene_sharded(model, cfg, scene, mesh)
    got_fused = predict_scene_fused(model, cfg, scene)
    np.testing.assert_allclose(got_fused, got_sharded, atol=2e-4, rtol=1e-4)
