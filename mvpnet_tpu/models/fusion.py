"""2D-3D fusion: FeatureAggregation + MVPNet3D (flax NNX).

Capability-equivalent of the reference ``MVPNet3D`` / ``FeatureAggregation``
(mvpnet/models/mvpnet_3d.py, UNVERIFIED; SURVEY.md §2.2, §3.3):

  images (B,V,H,W,3) -> UNet features (B*V,H,W,C2d) -> flatten to a pixel
  feature cloud (B, V*H*W, C2d) sitting at unprojected positions image_xyz
  -> per chunk point gather its kNN (k=3) pixel features -> shared-MLP over
  concat(feature, relative xyz) -> symmetric reduction over K -> PN2SSG.

TPU-first deviations:
  * the fusion kNN runs ON-DEVICE (ops.knn / Pallas tiled kernel) instead of
    a CPU KDTree in DataLoader workers (reference §3.4) — knn_indices are
    computed inside the jitted forward, not shipped with the batch.
  * invalid pixels (depth<=0) carry a +inf-like sentinel position from
    unproject_views, so masking is positional; no ragged shapes.
  * channels-last + bfloat16 compute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec

from mvpnet_tpu import ops
from mvpnet_tpu.config import AggregationConfig, ModelConfig
from mvpnet_tpu.models.blocks import SharedMLP
from mvpnet_tpu.models.pointnet2 import PN2SSG
from mvpnet_tpu.models.unet import UNetResNet34


class FeatureAggregation(nnx.Module):
    """Fuse K gathered multi-view pixel features into one per-point feature.

    Shared MLP over concat(gathered 2D feature, point - pixel_xyz offset),
    then a symmetric reduction (max/sum/mean) over the K neighbors —
    reference ``FeatureAggregation.forward`` semantics (SURVEY.md §2.2).
    """

    def __init__(self, in_channels: int, cfg: AggregationConfig, *, norm="batch", dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        c_in = in_channels + (3 if cfg.use_relative_xyz else 0)
        self.mlp = SharedMLP(c_in, cfg.mlp_channels, norm=norm, dtype=dtype, rngs=rngs)
        self.out_channels = self.mlp.out_channels

    def __call__(self, points, grouped_xyz, grouped_feat):
        """points: (B,N,3); grouped_xyz: (B,N,K,3); grouped_feat: (B,N,K,C).

        Returns fused per-point features (B, N, C')."""
        if self.cfg.use_relative_xyz:
            rel = grouped_xyz - points[:, :, None, :]
            grouped_feat = jnp.concatenate(
                [grouped_feat, rel.astype(grouped_feat.dtype)], axis=-1
            )
        out = self.mlp(grouped_feat)  # (B, N, K, C')
        if self.cfg.reduction == "max":
            return jnp.max(out, axis=2)
        if self.cfg.reduction == "sum":
            return jnp.sum(out, axis=2)
        if self.cfg.reduction == "mean":
            return jnp.mean(out, axis=2)
        raise ValueError(f"unknown reduction {self.cfg.reduction!r}")


class MVPNet3D(nnx.Module):
    """End-to-end 2D-3D fusion network for 3D semantic segmentation."""

    def __init__(self, cfg: ModelConfig, *, rngs: nnx.Rngs):
        dtype = jnp.dtype(cfg.pn2.dtype)
        self.cfg = cfg
        # set via dist.train_sp.install_space_fusion: route the fusion kNN
        # through the space-axis ring exchange (static attr -> retrace)
        self.fusion_mesh = None
        # set by models.build from cfg.train.remat: rematerialize the 2D
        # subnet in the backward pass — trades a second 2D forward for not
        # storing B*V full-resolution activation maps (the HBM lever for
        # the 32k-chunk / 64-view configs, config.py TrainConfig.remat)
        self.remat_2d = False
        self.net_2d = UNetResNet34(cfg.unet, rngs=rngs)
        self.aggregation = FeatureAggregation(
            cfg.unet.feature_channels,
            cfg.aggregation,
            norm=cfg.pn2.norm,
            dtype=dtype,
            rngs=rngs,
        )
        assert cfg.pn2.in_channels == self.aggregation.out_channels, (
            "pn2.in_channels must equal aggregation output "
            f"({cfg.pn2.in_channels} != {self.aggregation.out_channels})"
        )
        self.net_3d = PN2SSG(cfg.pn2, rngs=rngs)

    def __call__(self, batch):
        """batch dict:
          points:    (B, N, 3) chunk points (world frame)
          images:    (B, V, H, W, 3) RGB in [0, 1]
          image_xyz: (B, V, H, W, 3) unprojected pixel positions (world);
                     invalid pixels hold a large sentinel (see unproject_views)

        Returns:
          logits_3d: (B, N, num_classes) float32
          logits_2d: (B, V, H, W, num_classes) float32 (aux 2D supervision)
        """
        points = batch["points"]
        images = batch["images"]
        image_xyz = batch["image_xyz"]
        B, V, H, W, _ = images.shape
        N = points.shape[1]

        if self.remat_2d:
            feat2d, logits_2d = nnx.remat(lambda m, x: m(x))(
                self.net_2d, images.reshape(B * V, H, W, 3)
            )
        else:
            feat2d, logits_2d = self.net_2d(images.reshape(B * V, H, W, 3))
        C2d = feat2d.shape[-1]
        pixel_feat = feat2d.reshape(B, V * H * W, C2d)
        pixel_xyz = image_xyz.reshape(B, V * H * W, 3)

        # on-device fusion kNN (reference: CPU KDTree in the dataset, §3.4)
        mesh = self.fusion_mesh
        if mesh is not None and mesh.shape.get("space", 1) > 1:
            # space-sharded training (dist/train_sp.py): explicit ring
            # exchange of pixel blocks over the space axis; no shard ever
            # materializes the full per-chunk pixel cloud
            from mvpnet_tpu.dist.train_sp import sharded_fusion_gather

            grouped_xyz, grouped_feat = sharded_fusion_gather(
                mesh, points, pixel_xyz, pixel_feat, self.cfg.aggregation.k
            )
        else:
            # refs_coherent stays False: scanline pixel order interleaves
            # rows across the whole frustum, so unsorted ref tiles carry wide
            # AABBs and the gate prunes little — the kernel's Morton sort
            # pays for itself (on-chip A/B at B4 8192x96k: sorted 14.0 ms vs
            # natural 20.7 ms per batch; runs/r4_fusion_knn_ab.json)
            _, knn_idx = ops.knn(points, pixel_xyz, self.cfg.aggregation.k)
            grouped_feat = ops.group_points(pixel_feat, knn_idx)  # (B,N,K,C2d)
            grouped_xyz = ops.group_points(pixel_xyz, knn_idx)  # (B,N,K,3)

        fused = self.aggregation(points, grouped_xyz, grouped_feat)
        if mesh is not None and B % mesh.devices.size == 0:
            # 3D net is chunk-self-contained: re-split the batch over BOTH
            # mesh axes so the space shards do 1/S of the PN2SSG work too
            sharding = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
            points = jax.lax.with_sharding_constraint(points, sharding)
            fused = jax.lax.with_sharding_constraint(fused, sharding)
        logits_3d = self.net_3d(points, fused)
        return logits_3d, logits_2d.reshape(B, V, H, W, -1)
