"""UNet over a from-scratch ResNet-34 encoder (flax NNX, NHWC).

Capability-equivalent of the reference ``UNetResNet34``
(mvpnet/models/unet_resnet34.py, UNVERIFIED; SURVEY.md §2.2): an
encoder-decoder over posed RGB frames that emits BOTH per-pixel seg logits
and a full-resolution ~64-channel feature map consumed by the 3D fusion
stage.

TPU-first deviations from the reference:
  * NHWC layout end-to-end (lanes = channels).
  * bfloat16 compute / float32 params by default.
  * upsampling = bilinear resize to the skip's exact spatial shape + 3x3
    conv, so arbitrary (even odd) input resolutions work with static shapes.
  * no ImageNet pretraining available offline (no network): the encoder
    trains from scratch via the 2D pretraining stage (train_2d), which the
    reference pipeline already contains; ``load_torch_resnet34`` is the
    weight-import hook if torchvision weights appear on disk (SURVEY.md §7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from mvpnet_tpu.config import UNetConfig
from mvpnet_tpu.models.blocks import ConvBNRelu, apply_norm, make_norm


class BasicBlock(nnx.Module):
    """ResNet v1 BasicBlock: two 3x3 convs + identity/projection shortcut."""

    def __init__(self, c_in, c_out, *, stride=1, norm="batch", dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv1 = ConvBNRelu(c_in, c_out, stride=stride, norm=norm, dtype=dtype, rngs=rngs)
        self.conv2 = ConvBNRelu(c_out, c_out, norm=norm, use_relu=False, dtype=dtype, rngs=rngs)
        if stride != 1 or c_in != c_out:
            self.down = ConvBNRelu(
                c_in, c_out, kernel=1, stride=stride, norm=norm, use_relu=False, dtype=dtype, rngs=rngs
            )
        else:
            self.down = None

    def __call__(self, x):
        identity = x if self.down is None else self.down(x)
        out = self.conv2(self.conv1(x))
        return nnx.relu(out + identity)


class ResNet34Encoder(nnx.Module):
    """Stages of BasicBlocks: (3, 4, 6, 3) x channels (64, 128, 256, 512)."""

    def __init__(self, cfg: UNetConfig, *, dtype, rngs: nnx.Rngs):
        self.stem = nnx.Conv(
            cfg.in_channels,
            cfg.base_channels,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=nnx.initializers.kaiming_normal(),
            rngs=rngs,
        )
        self.stem_norm = make_norm(cfg.norm, cfg.base_channels, rngs=rngs, dtype=dtype)
        stages = []
        c_in = cfg.base_channels
        for stage_idx, (c_out, blocks) in enumerate(
            zip(cfg.stage_channels, cfg.stage_blocks)
        ):
            stage = []
            for b in range(blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                stage.append(
                    BasicBlock(c_in, c_out, stride=stride, norm=cfg.norm, dtype=dtype, rngs=rngs)
                )
                c_in = c_out
            stages.append(nnx.List(stage))
        self.stages = nnx.List(stages)

    def __call__(self, x):
        """Returns [stem_out, stage1, stage2, stage3, stage4] (coarsening)."""
        x = nnx.relu(apply_norm(self.stem_norm, self.stem(x)))
        feats = [x]
        x = nnx.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage in self.stages:
            for block in stage:
                x = block(x)
            feats.append(x)
        return feats


def _resize_to(x, target_hw):
    return jax.image.resize(
        x, (x.shape[0],) + tuple(target_hw) + (x.shape[-1],), method="bilinear"
    ).astype(x.dtype)


class UNetResNet34(nnx.Module):
    """Encoder-decoder producing (features, logits), both at input resolution."""

    def __init__(self, cfg: UNetConfig, *, rngs: nnx.Rngs):
        dtype = jnp.dtype(cfg.dtype)
        self.cfg = cfg
        self.encoder = ResNet34Encoder(cfg, dtype=dtype, rngs=rngs)
        skip_channels = (cfg.base_channels,) + tuple(cfg.stage_channels[:-1])
        decoders = []
        c_in = cfg.stage_channels[-1]
        for skip_c, dec_c in zip(reversed(skip_channels), cfg.decoder_channels):
            decoders.append(
                ConvBNRelu(c_in + skip_c, dec_c, norm=cfg.norm, dtype=dtype, rngs=rngs)
            )
            c_in = dec_c
        self.decoders = nnx.List(decoders)
        self.final = ConvBNRelu(c_in, cfg.feature_channels, norm=cfg.norm, dtype=dtype, rngs=rngs)
        self.seg_head = nnx.Conv(
            cfg.feature_channels,
            cfg.num_classes,
            kernel_size=(1, 1),
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )

    def __call__(self, images):
        """images: (B, H, W, 3) in [0, 1].

        Returns:
          features: (B, H, W, feature_channels)
          logits: (B, H, W, num_classes) float32
        """
        x = images.astype(jnp.dtype(self.cfg.dtype))
        feats = self.encoder(x)
        skips = feats[:-1]  # stem, s1, s2, s3
        y = feats[-1]
        for dec, skip in zip(self.decoders, reversed(skips)):
            y = _resize_to(y, skip.shape[1:3])
            y = dec(jnp.concatenate([y, skip], axis=-1))
        y = _resize_to(y, images.shape[1:3])
        features = self.final(y)
        logits = self.seg_head(features).astype(jnp.float32)
        return features, logits
