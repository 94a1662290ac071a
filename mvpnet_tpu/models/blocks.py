"""NN building blocks (flax NNX): SharedMLP, norm/act helpers.

Capability-equivalent of the reference's common/nn (SharedMLP = Conv1d/2d +
BN + ReLU stacks, init helpers — common/nn/*.py UNVERIFIED; SURVEY.md §2.2
"NN building blocks"). TPU-first: channels-last, so a 1x1 "conv" over points
is just a Dense over the trailing dim — it lowers to a single MXU matmul over
all points, with the BN+ReLU fused in by XLA.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import nnx


def make_norm(norm: str, features: int, *, rngs: nnx.Rngs, dtype=jnp.float32):
    if norm == "batch":
        # Normalizes over all leading dims (batch, points/pixels) — the
        # channels-last analog of torch BatchNorm1d/2d.
        return nnx.BatchNorm(
            features,
            use_running_average=False,
            axis_name=None,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )
    if norm == "group":
        return nnx.GroupNorm(
            features,
            num_groups=min(32, features),
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )
    if norm == "none":
        return None
    raise ValueError(f"unknown norm {norm!r}")


def apply_norm(norm, x):
    """Apply a norm layer to a (..., C) tensor.

    BatchNorm statistics pool over ALL leading dims (batch x points/pixels),
    matching torch BatchNorm1d/2d on (B, C, N)/(B, C, H, W); GroupNorm keeps
    the native leading-dim structure.
    """
    if norm is None:
        return x
    if isinstance(norm, nnx.BatchNorm):
        shape = x.shape
        return norm(x.reshape(-1, shape[-1])).reshape(shape)
    return norm(x)


class SharedMLP(nnx.Module):
    """Per-point MLP: Dense -> norm -> ReLU stacks over the trailing dim.

    Applied to any (..., C_in) tensor; shared across all leading dims
    (points, neighbors, pixels) — the channels-last equivalent of the
    reference's SharedMLP Conv1d/Conv2d stacks.
    """

    def __init__(
        self,
        in_channels: int,
        channels: Sequence[int],
        *,
        norm: str = "batch",
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        layers = []
        norms = []
        c_in = in_channels
        for c_out in channels:
            layers.append(
                nnx.Linear(
                    c_in,
                    c_out,
                    use_bias=(norm == "none"),
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nnx.initializers.kaiming_normal(),
                    rngs=rngs,
                )
            )
            norms.append(make_norm(norm, c_out, rngs=rngs, dtype=dtype))
            c_in = c_out
        self.layers = nnx.List(layers)
        self.norms = nnx.List(norms)
        self.out_channels = c_in

    def __call__(self, x):
        for lin, norm in zip(self.layers, self.norms):
            x = lin(x)
            x = apply_norm(norm, x)
            x = nnx.relu(x)
        return x


class ConvBNRelu(nnx.Module):
    """3x3 (or kxk) conv -> norm -> ReLU for the 2D net (NHWC)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        *,
        kernel: int = 3,
        stride: int = 1,
        norm: str = "batch",
        use_relu: bool = True,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.conv = nnx.Conv(
            in_channels,
            out_channels,
            kernel_size=(kernel, kernel),
            strides=(stride, stride),
            padding="SAME",
            use_bias=False,
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=nnx.initializers.kaiming_normal(),
            rngs=rngs,
        )
        self.norm = make_norm(norm, out_channels, rngs=rngs, dtype=dtype)
        self.use_relu = use_relu

    def __call__(self, x):
        x = self.conv(x)
        x = apply_norm(self.norm, x)
        if self.use_relu:
            x = nnx.relu(x)
        return x
