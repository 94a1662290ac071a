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


# ---------------------------------------------------------------------------
# torchvision resnet34 weight import (SURVEY.md §7 weight-import hook)
# ---------------------------------------------------------------------------


def _fake_torchvision_resnet34_sd(rng):
    """Random state_dict with exact torchvision resnet34 key names/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[name] = (rng.normal(size=(o, i, k, k)) * 0.05).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".bias"] = (rng.normal(size=c) * 0.1).astype(np.float32)
        sd[prefix + ".running_mean"] = (rng.normal(size=c) * 0.1).astype(np.float32)
        sd[prefix + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".num_batches_tracked"] = np.array(0)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    for L, n, c, cin_first in ((1, 3, 64, 64), (2, 4, 128, 64), (3, 6, 256, 128), (4, 3, 512, 256)):
        for b in range(n):
            cin = cin_first if b == 0 else c
            conv(f"layer{L}.{b}.conv1.weight", c, cin, 3)
            bn(f"layer{L}.{b}.bn1", c)
            conv(f"layer{L}.{b}.conv2.weight", c, c, 3)
            bn(f"layer{L}.{b}.bn2", c)
            if b == 0 and L > 1:
                conv(f"layer{L}.{b}.downsample.0.weight", c, cin, 1)
                bn(f"layer{L}.{b}.downsample.1", c)
    sd["fc.weight"] = np.zeros((1000, 512), np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_load_torch_resnet34(rng):
    import torch
    import torch.nn.functional as F

    from mvpnet_tpu.config import UNetConfig
    from mvpnet_tpu.models.unet import ResNet34Encoder, load_torch_resnet34
    from tests.oracle_torch import _same_pad

    cfg = UNetConfig(dtype="float32")  # full resnet34 shape
    enc = ResNet34Encoder(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = _fake_torchvision_resnet34_sd(rng)
    used = load_torch_resnet34(enc, sd)
    # every encoder key consumed exactly once; fc/num_batches never touched
    expect = {k for k in sd if not k.startswith("fc.") and "num_batches" not in k}
    assert set(used) == expect and len(used) == len(expect)
    # weights landed where they should, in HWIO orientation
    np.testing.assert_allclose(
        np.asarray(enc.stem.kernel.value),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(enc.stages[1][0].down.norm.var.value),
        sd["layer2.0.downsample.1.running_var"],
    )
    # functional check: imported stem conv == torch conv2d on the raw weight
    x = rng.uniform(size=(1, 10, 12, 3)).astype(np.float32)
    ours = np.asarray(enc.stem(jnp.asarray(x)))
    xt = _same_pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), 7, 2)
    theirs = F.conv2d(xt, torch.from_numpy(sd["conv1.weight"]), stride=2)
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    # a wrongly-shaped checkpoint fails loudly
    bad = dict(sd)
    bad["conv1.weight"] = bad["conv1.weight"][:, :1]
    with pytest.raises(ValueError):
        load_torch_resnet34(
            ResNet34Encoder(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0)), bad
        )
    with pytest.raises(KeyError):
        load_torch_resnet34(
            ResNet34Encoder(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0)), {"conv1.weight": sd["conv1.weight"]}
        )


def test_load_torch_resnet34_npz_roundtrip(tmp_path, rng):
    from mvpnet_tpu.config import UNetConfig
    from mvpnet_tpu.models.unet import ResNet34Encoder, load_torch_resnet34_file

    sd = _fake_torchvision_resnet34_sd(rng)
    path = str(tmp_path / "resnet34.npz")
    np.savez(path, **sd)
    cfg = UNetConfig(dtype="float32")
    enc = ResNet34Encoder(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0))
    used = load_torch_resnet34_file(enc, path)
    assert len(used) > 100
    np.testing.assert_allclose(
        np.asarray(enc.stem.kernel.value), sd["conv1.weight"].transpose(2, 3, 1, 0)
    )


def test_pn2ssg_valid_mask_matches_unpadded(rng):
    """Padded input + valid_mask must reproduce the unpadded logits at valid
    rows (round-1 VERDICT weak #8: the mask plumbing is now live)."""
    from mvpnet_tpu.models.pointnet2 import PN2SSG

    cfg = tiny_pn2_cfg(in_channels=0)
    model = PN2SSG(cfg, rngs=nnx.Rngs(0))
    model.eval()
    N, P = 64, 96  # 64 valid points padded to 96
    xyz = jnp.asarray(rng.uniform(-1, 1, (2, N, 3)), jnp.float32)
    pad = jnp.full((2, P - N, 3), 50.0, jnp.float32)  # far-away padding
    xyz_pad = jnp.concatenate([xyz, pad], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((2, N), bool), jnp.zeros((2, P - N), bool)], axis=1
    )
    want = np.asarray(model(xyz))
    got = np.asarray(model(xyz_pad, valid_mask=mask))[:, :N]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
