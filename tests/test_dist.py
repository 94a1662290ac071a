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
