"""Parity gate (SURVEY.md §4 item 5): full MVPNet3D forward/grad vs an
INDEPENDENT torch-CPU oracle (tests/oracle_torch.py) with identical weights.

This bounds silent semantic drift of the whole fusion net — BN pooling
semantics, TF-SAME padding, bilinear resize, FPS/ball-query/kNN/3-NN
semantics, feature-propagation ordering — which is the only available proxy
for the 0.5-mIoU-of-reference target while the reference mount is empty.

Tolerances (documented per VERDICT round 1, next #1): both paths run float32
end to end; the torch side uses oneDNN convs, the JAX side XLA:CPU, so
per-logit differences up to ~1e-3 are accumulation-order noise. Index ops are
compared on continuous random geometry (measure-zero tie probability), so
index parity is exact and the logits agree to <5e-3 absolute / >0.99999
cosine.
"""
import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import nnx

from mvpnet_tpu.models import build_model
from mvpnet_tpu.data.pipeline import ChunkDataset
from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.train.step import prepare_batch
from tests.oracle_torch import TorchMVPNet3D, torch_cross_entropy
from tests.test_models import tiny_config
from tests.test_pipeline import small_data_cfg  # noqa: F401 (used in tests)


@pytest.fixture(scope="module")
def parity_setup():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, data=small_data_cfg())
    model, loss_fn, _ = build_model(cfg, rngs=nnx.Rngs(0))

    scene = make_scene(7, num_points=20000, num_frames=6, height=24, width=32, num_classes=5)
    ds = ChunkDataset([scene], cfg.data, batch_size=2, training=False, seed=3)
    raw = jax.device_put(next(iter(ds)))
    batch = prepare_batch(cfg, raw, training=False)

    # Give BN nontrivial running statistics (a fresh model's 0-mean/1-var
    # would make eval BN a near-identity and hide pooling-semantics bugs):
    # one train-mode forward updates every BN's running stats.
    model.train()
    model(batch)
    model.eval()

    toracle = TorchMVPNet3D(model)
    toracle.eval()
    tbatch = {
        k: torch.from_numpy(np.asarray(batch[k], np.float32))
        for k in ("points", "images", "image_xyz")
    }
    return cfg, model, loss_fn, batch, toracle, tbatch


def test_forward_logit_parity(parity_setup):
    cfg, model, _, batch, toracle, tbatch = parity_setup
    logits_3d, logits_2d = model(batch)
    with torch.no_grad():
        t3d, t2d = toracle(tbatch)

    a, b = np.asarray(logits_3d), t3d.numpy()
    assert a.shape == b.shape
    scale = max(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() < 5e-3 * max(scale, 1.0), (
        f"3D logit drift: max abs {np.abs(a - b).max():.2e} (scale {scale:.2f})"
    )
    cos = np.dot(a.ravel(), b.ravel()) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    )
    assert cos > 0.99999, cos

    a2, b2 = np.asarray(logits_2d), t2d.numpy()
    assert np.abs(a2 - b2).max() < 5e-3 * max(np.abs(b2).max(), 1.0)

    # predictions (what mIoU sees) must agree except at near-tied argmaxes
    pa, pb = a.argmax(-1), b.argmax(-1)
    assert (pa == pb).mean() > 0.999, (pa == pb).mean()


def test_whole_scene_eval_parity(parity_setup):
    """Eval-path parity gate (round-2 VERDICT next #7): the whole-scene
    prediction pipeline — sliding windows, deterministic point sampling,
    per-window forward, logit accumulation, NN-fill of uncovered points —
    against a torch-oracle restatement that shares only the host-side window
    enumeration (pure numpy, tested elsewhere) and runs all device math
    through the independent torch net. Bounds drift of the path that
    produces the metric of record (SURVEY.md §3.2, §4 item 5)."""
    from mvpnet_tpu.eval.whole_scene import (
        enumerate_chunk_centers,
        nn_fill_uncovered,
        predict_scene,
    )
    from mvpnet_tpu.data.pipeline import collate, make_chunk_sample

    cfg, model, _, _, toracle, _ = parity_setup
    cfg = dataclasses.replace(
        cfg,
        data=small_data_cfg(num_points=128, chunk_size=2.0, chunk_stride=1.5),
    )
    scene = make_scene(
        11, num_points=10000, num_frames=5, height=24, width=32, num_classes=5
    )

    logits_jax = predict_scene(model, cfg, scene, batch_size=2)

    acc = np.zeros_like(logits_jax)
    counts = np.zeros(len(scene.points), np.int32)
    half = cfg.data.chunk_size / 2 + cfg.data.chunk_margin
    windows = 0
    for center in enumerate_chunk_centers(
        scene.points, cfg.data.chunk_size, cfg.data.chunk_stride
    ):
        near = np.abs(scene.points[:, :2] - center)
        if not np.any((near[:, 0] <= half) & (near[:, 1] <= half)):
            continue
        s = make_chunk_sample(
            scene,
            cfg.data,
            center_xy=center,
            num_views=cfg.data.num_views_eval,
            rng=None,
        )
        pidx = s.pop("point_idx")
        s.pop("colors", None)
        mb = prepare_batch(cfg, jax.device_put(collate([s])), training=False)
        tb = {
            k: torch.from_numpy(np.asarray(mb[k], np.float32))
            for k in ("points", "images", "image_xyz")
        }
        with torch.no_grad():
            t3d, _ = toracle(tb)
        np.add.at(acc, pidx, t3d.numpy()[0])
        np.add.at(counts, pidx, 1)
        windows += 1
    assert windows >= 3, "scene too small to exercise accumulation"
    nn_fill_uncovered(scene.points, acc, counts)

    # scene-level predictions (what mIoU sees) must agree except at
    # near-tied argmaxes; accumulated logits stay within per-window noise
    pa, pb = logits_jax.argmax(1), acc.argmax(1)
    assert (pa == pb).mean() > 0.995, (pa == pb).mean()
    scale = max(np.abs(acc).max(), 1.0)
    assert np.abs(logits_jax - acc).max() < 5e-3 * scale * max(counts.max(), 1)


def test_grad_parity(parity_setup):
    cfg, model, loss_fn, batch, toracle, tbatch = parity_setup
    ignore = cfg.data.ignore_label

    # --- JAX side (eval-mode BN: deterministic, differentiable) ---
    def jax_loss(m):
        out = m(batch)
        return loss_fn(out, batch)

    jloss, grads = nnx.value_and_grad(jax_loss)(model)

    # --- torch side ---
    toracle.zero_grad()
    t3d, t2d = toracle(tbatch)
    labels = torch.from_numpy(np.asarray(batch["seg_label"]))
    labels_2d = torch.from_numpy(np.asarray(batch["seg_label_2d"]))
    tloss = torch_cross_entropy(t3d, labels, ignore)
    tloss = tloss + cfg.model.aux_2d_loss_weight * torch_cross_entropy(
        t2d, labels_2d, ignore
    )
    tloss.backward()

    assert abs(float(jloss) - float(tloss)) < 2e-3, (float(jloss), float(tloss))

    def cosine(a, b):
        a, b = a.ravel(), b.ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # matched parameter leaves across independent implementations
    pairs = {
        "unet.stem": (
            grads["net_2d"]["encoder"]["stem"]["kernel"][...],
            toracle.net_2d.stem.weight.grad.permute(2, 3, 1, 0).numpy(),
        ),
        "unet.seg_head": (
            grads["net_2d"]["seg_head"]["kernel"][...],
            toracle.net_2d.seg_head.weight.grad.permute(2, 3, 1, 0).numpy(),
        ),
        "aggregation.mlp0": (
            grads["aggregation"]["mlp"]["layers"][0]["kernel"][...],
            toracle.aggregation.mlp.linears[0].weight.grad.T.numpy(),
        ),
        "pn2.sa0.mlp0": (
            grads["net_3d"]["sa_layers"][0]["mlp"]["layers"][0]["kernel"][...],
            toracle.net_3d.sa_layers[0].mlp.linears[0].weight.grad.T.numpy(),
        ),
        "pn2.head": (
            grads["net_3d"]["head"]["kernel"][...],
            toracle.net_3d.head.weight.grad.T.numpy(),
        ),
    }
    for name, (jg, tg) in pairs.items():
        jg = np.asarray(jg)
        assert jg.shape == tg.shape, (name, jg.shape, tg.shape)
        c = cosine(jg, tg)
        assert c > 0.999, f"{name}: grad cosine {c:.6f}"
        # magnitudes agree too (cosine alone would pass a wrongly-scaled grad)
        ratio = np.linalg.norm(jg) / (np.linalg.norm(tg) + 1e-12)
        assert 0.99 < ratio < 1.01, f"{name}: grad norm ratio {ratio:.4f}"
