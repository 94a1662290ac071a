"""Module-level model tests (SURVEY.md §4 implication 2): shapes, invariances,
gradient flow — all on tiny shapes, CPU backend."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from mvpnet_tpu.config import (
    AggregationConfig,
    Config,
    ModelConfig,
    PN2SSGConfig,
    SetAbstractionConfig,
    UNetConfig,
)
from mvpnet_tpu.models import PN2SSG, UNetResNet34, build_model
from mvpnet_tpu.models.fusion import FeatureAggregation


def tiny_pn2_cfg(num_classes=5, in_channels=8):
    return PN2SSGConfig(
        num_classes=num_classes,
        in_channels=in_channels,
        sa=(
            SetAbstractionConfig(32, 0.2, 8, (16, 16)),
            SetAbstractionConfig(8, 0.4, 8, (16, 32)),
        ),
        fp_channels=((32,), (32, 16)),
        head_channels=16,
        dtype="float32",
    )


def tiny_unet_cfg(num_classes=5):
    return UNetConfig(
        num_classes=num_classes,
        base_channels=8,
        stage_channels=(8, 16, 16, 32),
        stage_blocks=(1, 1, 1, 1),
        decoder_channels=(16, 16, 8, 8),
        feature_channels=8,
        dtype="float32",
    )


def tiny_config(num_classes=5):
    unet = tiny_unet_cfg(num_classes)
    agg = AggregationConfig(k=3, mlp_channels=(8, 8))
    pn2 = tiny_pn2_cfg(num_classes, in_channels=8)
    model = ModelConfig(name="mvpnet_3d", unet=unet, aggregation=agg, pn2=pn2)
    cfg = Config(model=model)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, num_classes=num_classes)
    )


def test_unet_shapes(rng):
    cfg = tiny_unet_cfg()
    model = UNetResNet34(cfg, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.uniform(size=(2, 24, 32, 3)), jnp.float32)
    feat, logits = model(x)
    assert feat.shape == (2, 24, 32, 8)
    assert logits.shape == (2, 24, 32, 5)
    assert logits.dtype == jnp.float32


def test_unet_odd_resolution(rng):
    # decoder must handle non-power-of-two sizes (e.g. 120x160 after strides)
    cfg = tiny_unet_cfg()
    model = UNetResNet34(cfg, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.uniform(size=(1, 30, 40, 3)), jnp.float32)
    feat, logits = model(x)
    assert feat.shape == (1, 30, 40, 8)


def test_pn2ssg_shapes(rng):
    cfg = tiny_pn2_cfg()
    model = PN2SSG(cfg, rngs=nnx.Rngs(0))
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(2, 128, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(2, 128, 8)), jnp.float32)
    out = model(xyz, feat)
    assert out.shape == (2, 128, 5)


def test_pn2ssg_xyz_only(rng):
    cfg = dataclasses.replace(tiny_pn2_cfg(), in_channels=0)
    model = PN2SSG(cfg, rngs=nnx.Rngs(0))
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 3)), jnp.float32)
    out = model(xyz, None)
    assert out.shape == (1, 64, 5)


def test_feature_aggregation_permutation_invariant(rng):
    """max-reduction over K neighbors must not depend on neighbor order."""
    agg = FeatureAggregation(
        6, AggregationConfig(k=4, mlp_channels=(8,), reduction="max"), rngs=nnx.Rngs(0)
    )
    agg.eval()
    pts = jnp.asarray(rng.uniform(size=(1, 10, 3)), jnp.float32)
    gxyz = jnp.asarray(rng.uniform(size=(1, 10, 4, 3)), jnp.float32)
    gfeat = jnp.asarray(rng.normal(size=(1, 10, 4, 6)), jnp.float32)
    out1 = agg(pts, gxyz, gfeat)
    perm = [2, 0, 3, 1]
    out2 = agg(pts, gxyz[:, :, perm], gfeat[:, :, perm])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_mvpnet3d_forward_and_grad(rng):
    cfg = tiny_config()
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    B, V, H, W, N = 1, 2, 16, 16, 64
    batch = {
        "points": jnp.asarray(rng.uniform(-1, 1, size=(B, N, 3)), jnp.float32),
        "images": jnp.asarray(rng.uniform(size=(B, V, H, W, 3)), jnp.float32),
        "image_xyz": jnp.asarray(rng.uniform(-1, 1, size=(B, V, H, W, 3)), jnp.float32),
        "seg_label": jnp.asarray(rng.integers(0, 5, size=(B, N)), jnp.int32),
    }
    out = model(batch)
    logits_3d, logits_2d = out
    assert logits_3d.shape == (B, N, 5)
    assert logits_2d.shape == (B, V, H, W, 5)

    def loss_of(m):
        return loss_fn(m(batch), batch)

    loss, grads = nnx.value_and_grad(loss_of)(model)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    # gradient reaches the 2D net through the fusion gather
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0

    metrics = metric_fn(out, batch)
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    assert metrics["confusion"].shape == (5, 5)


def test_mvpnet3d_ignore_label_loss(rng):
    cfg = tiny_config()
    model, loss_fn, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    B, V, H, W, N = 1, 2, 16, 16, 64
    batch = {
        "points": jnp.asarray(rng.uniform(-1, 1, size=(B, N, 3)), jnp.float32),
        "images": jnp.asarray(rng.uniform(size=(B, V, H, W, 3)), jnp.float32),
        "image_xyz": jnp.asarray(rng.uniform(-1, 1, size=(B, V, H, W, 3)), jnp.float32),
    }
    labels = np.asarray(rng.integers(0, 5, size=(B, N)), np.int32)
    out = model(batch)
    l_full = loss_fn(out, {**batch, "seg_label": jnp.asarray(labels)})
    # ignoring half the points changes the mean only over the valid set
    labels2 = labels.copy()
    labels2[:, ::2] = -100
    l_half = loss_fn(out, {**batch, "seg_label": jnp.asarray(labels2)})
    assert np.isfinite(float(l_half))
    # all-ignored -> loss 0, not NaN
    l_none = loss_fn(out, {**batch, "seg_label": jnp.full_like(labels, -100)})
    assert float(l_none) == 0.0


def test_overfit_single_chunk(rng):
    """BASELINE.json config #1: forward+backward of the full fusion net on one
    synthetic chunk; loss must decrease when overfitting."""
    import optax

    cfg = tiny_config()
    model, loss_fn, _ = build_model(cfg, rngs=nnx.Rngs(0))
    B, V, H, W, N = 1, 2, 16, 16, 64
    pts = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    # labels correlated with geometry (left/right halves) so the task is learnable
    labels = (pts[..., 0] > 0).astype(np.int32)
    batch = {
        "points": jnp.asarray(pts),
        "images": jnp.asarray(rng.uniform(size=(B, V, H, W, 3)), jnp.float32),
        "image_xyz": jnp.asarray(rng.uniform(-1, 1, size=(B, V, H, W, 3)), jnp.float32),
        "seg_label": jnp.asarray(labels),
    }
    opt = nnx.Optimizer(model, optax.adam(1e-2), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt):
        def lf(m):
            return loss_fn(m(batch), batch)

        loss, grads = nnx.value_and_grad(lf)(model)
        opt.update(model, grads)
        return loss

    losses = [float(step(model, opt)) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5, losses[::5]
