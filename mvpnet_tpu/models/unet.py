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


def load_torch_resnet34(encoder: ResNet34Encoder, state_dict) -> list[str]:
    """Import torchvision ``resnet34`` weights into the NNX encoder.

    SURVEY.md §7 "2D pretraining without ImageNet weights": this machine has
    no network, so the encoder normally trains from scratch via train_2d —
    but if torchvision weights appear on disk (a ``torch.load``-able .pth
    state_dict or an .npz with the same key layout), this maps them in:

      conv1/layerL.B.convN weights: NCHW (O, I, kH, kW) -> HWIO;
      bn weight/bias/running_mean/running_var -> scale/bias/mean/var;
      layerL.B.downsample.{0,1} -> stages[L-1][B].down.{conv,norm}.

    Head keys (fc.*) and num_batches_tracked are ignored. Returns the list
    of consumed keys; raises KeyError on a missing expected key and
    ValueError on a shape mismatch — a partial or differently-shaped
    checkpoint fails loudly instead of loading silently wrong.
    """
    import numpy as np

    used: list[str] = []

    def arr(name):
        if name not in state_dict:
            raise KeyError(f"torch resnet34 state_dict missing key {name!r}")
        v = state_dict[name]
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        used.append(name)
        return np.asarray(v)

    def set_conv(conv, name):
        k = arr(name).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        want = tuple(conv.kernel.value.shape)
        if want != k.shape:
            raise ValueError(f"{name}: shape {k.shape} != encoder {want}")
        conv.kernel.value = jnp.asarray(k, conv.kernel.value.dtype)

    def set_bn(norm, prefix):
        if not isinstance(norm, nnx.BatchNorm):
            raise ValueError(
                f"{prefix}: torchvision weights carry BatchNorm stats but the "
                f"encoder was built with norm={type(norm).__name__}"
            )
        for tkey, attr in (
            ("weight", "scale"),
            ("bias", "bias"),
            ("running_mean", "mean"),
            ("running_var", "var"),
        ):
            v = arr(f"{prefix}.{tkey}")
            slot = getattr(norm, attr)
            if tuple(slot.value.shape) != v.shape:
                raise ValueError(
                    f"{prefix}.{tkey}: shape {v.shape} != {tuple(slot.value.shape)}"
                )
            slot.value = jnp.asarray(v, slot.value.dtype)

    set_conv(encoder.stem, "conv1.weight")
    set_bn(encoder.stem_norm, "bn1")
    for s, stage in enumerate(encoder.stages):
        for b, block in enumerate(stage):
            p = f"layer{s + 1}.{b}"
            set_conv(block.conv1.conv, f"{p}.conv1.weight")
            set_bn(block.conv1.norm, f"{p}.bn1")
            set_conv(block.conv2.conv, f"{p}.conv2.weight")
            set_bn(block.conv2.norm, f"{p}.bn2")
            if block.down is not None:
                set_conv(block.down.conv, f"{p}.downsample.0.weight")
                set_bn(block.down.norm, f"{p}.downsample.1")
    # a structurally mismatched checkpoint (e.g. downsample weights where the
    # encoder has down=None) must not load "successfully" with weights
    # silently dropped (advisor round-2 low #4)
    leftover = [
        k
        for k in state_dict
        if k not in used
        and not k.startswith("fc.")
        and not k.endswith("num_batches_tracked")
    ]
    if leftover:
        raise ValueError(
            f"torch resnet34 state_dict has {len(leftover)} unconsumed "
            f"non-head keys (encoder structure mismatch): {leftover[:8]}..."
        )
    return used


def load_torch_resnet34_file(encoder: ResNet34Encoder, path: str) -> list[str]:
    """load_torch_resnet34 from a .pth (torch.load) or .npz file on disk."""
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path) as f:
            return load_torch_resnet34(encoder, dict(f))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return load_torch_resnet34(encoder, sd)


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
