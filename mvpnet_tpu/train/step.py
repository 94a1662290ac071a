"""Device-side batch preparation + jitted train/eval steps.

The host ships raw arrays (images, depth, poses, intrinsics, points,
labels); everything geometric — depth unprojection (lift) and train-time
augmentation — happens here INSIDE the jitted step, on device. This is the
central inversion vs the reference, whose DataLoader workers did unprojection
+ KDTree kNN on CPU (scannet_2d3d.py §3.4; SURVEY.md §7 layer 5). The fusion
kNN itself runs inside MVPNet3D.forward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from mvpnet_tpu.config import Config
from mvpnet_tpu.core.augment import augment_chunk, augment_frame
from mvpnet_tpu.core.camera import unproject_views


def prepare_frame_batch(cfg: Config, batch: dict, *, training: bool, rng_key=None) -> dict:
    """Frame-mode preparation (frame-level 2D pretraining, data/frames.py):
    dequantize + 2D augmentation; NO depth-validity masking of the labels —
    the reference's frame dataset supervises every labeled pixel (SURVEY.md
    §2.2 "2D dataset"; round-1 VERDICT missing #8)."""
    images = batch["images"]  # (B, H, W, 3)
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    label = batch["seg_label_2d"]
    if label.dtype == jnp.int8:
        label = label.astype(jnp.int32)
    if training and cfg.data.augment and rng_key is not None:
        keys = jax.random.split(rng_key, images.shape[0])
        images, label = jax.vmap(
            lambda k, im, lb: augment_frame(
                k, im, lb, flip_prob=cfg.data.flip_prob, jitter=cfg.data.color_jitter
            )
        )(keys, images, label)
    # add the views axis the 2D model/loss expect: (B, 1, H, W, ...)
    return {"images": images[:, None], "seg_label_2d": label[:, None]}


def prepare_batch(cfg: Config, batch: dict, *, training: bool, rng_key=None) -> dict:
    """Lift depth to world-space pixel clouds; apply augmentation (train).

    Input batch (host layout, see data/pipeline.py):
      points (B,N,3), seg_label (B,N), images (B,V,H,W,3), depth (B,V,H,W),
      poses (B,V,4,4), intrinsics (B,3,3), seg_label_2d (B,V,H,W)
    Output adds image_xyz (B,V,H,W,3) and applies shared geometric
    augmentation to points + image_xyz.

    Frame-mode batches (no depth/points keys; data/frames.py) route to
    prepare_frame_batch.
    """
    if "depth" not in batch:
        return prepare_frame_batch(cfg, batch, training=training, rng_key=rng_key)
    depth = batch["depth"]
    images = batch["images"]
    # compact wire format (data/pipeline.py): dequantize on device
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if depth.dtype == jnp.uint16:
        depth = depth.astype(jnp.float32) / 1000.0
    batch = dict(batch)
    if batch["points"].dtype == jnp.int16:  # int16 millimeters
        batch["points"] = batch["points"].astype(jnp.float32) / 1000.0
    for k in ("seg_label", "seg_label_2d"):
        if k in batch and batch[k].dtype == jnp.int8:
            batch[k] = batch[k].astype(jnp.int32)
    B = depth.shape[0]
    intr = batch["intrinsics"][:, None]  # (B,1,3,3) broadcast over V
    image_xyz, valid = unproject_views(
        depth, jnp.broadcast_to(intr, depth.shape[:2] + (3, 3)), batch["poses"]
    )
    points = batch["points"]
    if training and cfg.data.augment and rng_key is not None:
        keys = jax.random.split(rng_key, B)
        points, image_xyz, images = jax.vmap(
            lambda k, p, x, im: augment_chunk(
                k,
                p,
                x,
                im,
                z_rot=cfg.data.z_rot,
                flip_prob=cfg.data.flip_prob,
                jitter=cfg.data.color_jitter,
            )
        )(keys, points, image_xyz, images)

    out = {
        "points": points,
        "images": images,
        "image_xyz": image_xyz,
        "image_valid": valid,
    }
    if "seg_label" in batch:  # absent in pure-inference batches (serving)
        out["seg_label"] = batch["seg_label"]
    if "colors" in batch:
        # per-point RGB for the xyz+RGB ablation models (models/build.PN2Seg)
        colors = batch["colors"]
        if colors.dtype == jnp.uint8:
            colors = colors.astype(jnp.float32) / 255.0
        out["colors"] = colors
    if "seg_label_2d" in batch:
        # 2D aux supervision only on valid-depth pixels
        out["seg_label_2d"] = jnp.where(
            valid, batch["seg_label_2d"], cfg.data.ignore_label
        )
    return out


def make_train_step(cfg: Config, loss_fn, metric_fn):
    """Build the jitted training step: (model, optimizer, batch, key) -> aux.

    With ``cfg.train.grad_accum > 1`` the batch is split into that many
    sequential microbatches inside the step (``lax.scan``), gradients are
    averaged and applied in ONE optimizer update — how the big-batch configs
    (BASELINE #3: batch 32 at 32k points) run within a single chip's memory
    and the compiler's program ceiling. Loss/accuracy are microbatch means
    and the confusion matrix is summed; BN batch statistics see
    microbatch-sized batches (the same trade the reference makes when its
    GPU forces a smaller batch).
    """
    accum = max(1, int(cfg.train.grad_accum))

    @nnx.jit(donate_argnames=() if not cfg.train.donate else ("model", "optimizer"))
    def train_step(model, optimizer, batch, rng_key):
        if accum == 1:
            model_batch = prepare_batch(cfg, batch, training=True, rng_key=rng_key)

            def compute_loss(m):
                out = m(model_batch)
                return loss_fn(out, model_batch), out

            (loss, out), grads = nnx.value_and_grad(compute_loss, has_aux=True)(model)
            optimizer.update(model, grads)
            metrics = metric_fn(out, model_batch)
            metrics["loss"] = loss
            return metrics

        # ---- gradient accumulation over microbatches (nnx.scan threads
        # the module's BN stats / rng counts through the loop) ----
        B = jax.tree.leaves(batch)[0].shape[0]
        assert B % accum == 0, f"batch {B} not divisible by grad_accum={accum}"
        micro = jax.tree.map(
            lambda v: v.reshape((accum, B // accum) + tuple(v.shape[1:])), batch
        )
        keys = jax.random.split(rng_key, accum)

        @nnx.scan(in_axes=(nnx.Carry, 0, 0), out_axes=(nnx.Carry, 0))
        def body(carry, mb, key):
            model, gacc = carry
            model_batch = prepare_batch(cfg, mb, training=True, rng_key=key)

            def compute_loss(m):
                out = m(model_batch)
                return loss_fn(out, model_batch), out

            (loss, out), grads = nnx.value_and_grad(compute_loss, has_aux=True)(
                model
            )
            metrics = metric_fn(out, model_batch)
            metrics["loss"] = loss
            gacc = jax.tree.map(jnp.add, gacc, grads)
            return (model, gacc), metrics

        gzero = jax.tree.map(jnp.zeros_like, nnx.state(model, nnx.Param))
        (model, gsum), metrics_stack = body((model, gzero), micro, keys)
        gmean = jax.tree.map(lambda g: g / accum, gsum)
        optimizer.update(model, gmean)
        metrics = {}
        for k, v in metrics_stack.items():
            # counts (confusion matrix) sum; rates/losses average
            metrics[k] = (
                jnp.sum(v, axis=0)
                if k == "confusion"
                else jnp.mean(v.astype(jnp.float32), axis=0)
            )
        return metrics

    return train_step


def make_eval_step(cfg: Config, loss_fn, metric_fn):
    @nnx.jit
    def eval_step(model, batch):
        model_batch = prepare_batch(cfg, batch, training=False)
        out = model(model_batch)
        metrics = metric_fn(out, model_batch)
        metrics["loss"] = loss_fn(out, model_batch)
        return metrics

    return eval_step
