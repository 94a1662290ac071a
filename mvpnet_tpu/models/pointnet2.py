"""PointNet++ SSG segmentation network (flax NNX, channels-last).

Capability-equivalent of the reference ``PN2SSG`` with its SetAbstraction /
FeaturePropagation modules (mvpnet/models/pn2ssg.py, UNVERIFIED; semantics
fixed by the PointNet++ paper — SURVEY.md §2.2, §3.3):

  SA x4:  FPS -> ball query -> group -> SharedMLP -> max-pool
  FP x4:  three-NN inverse-distance interpolation -> skip concat -> SharedMLP
  head:   per-point MLP -> dropout -> linear to num_classes

TPU-first: every stage is a fixed-shape masked tensor program; the grouped
MLP runs as one big (B*M*K, C) matmul on the MXU; FPS/ball-query/kNN come
from mvpnet_tpu.ops (jnp reference or Pallas kernels, dispatched at runtime).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from mvpnet_tpu import ops
from mvpnet_tpu.config import PN2SSGConfig
from mvpnet_tpu.models.blocks import SharedMLP


class SetAbstraction(nnx.Module):
    """FPS -> ball query -> grouping -> per-group SharedMLP -> max-pool."""

    def __init__(
        self,
        in_channels: int,
        npoint: int,
        radius: float,
        nsample: int,
        mlp_channels,
        *,
        use_xyz: bool = True,
        norm: str = "batch",
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.use_xyz = use_xyz
        c_in = in_channels + (3 if use_xyz else 0)
        self.mlp = SharedMLP(c_in, mlp_channels, norm=norm, dtype=dtype, rngs=rngs)
        self.out_channels = self.mlp.out_channels

    def __call__(self, xyz, features, valid_mask=None):
        """xyz: (B, N, 3); features: (B, N, C) or None; valid_mask: optional
        (B, N) bool for padded inputs — invalid points are never selected as
        centroids nor gathered as neighbors (masked FPS/ball-query variants).

        Returns (new_xyz (B, M, 3), new_features (B, M, C'))."""
        centroid_idx = ops.farthest_point_sample(
            xyz, self.npoint, valid_mask=valid_mask
        )  # (B, M)
        new_xyz = jnp.take_along_axis(xyz, centroid_idx[..., None], axis=1)
        group_idx, _ = ops.ball_query(
            new_xyz, xyz, self.radius, self.nsample, valid_mask=valid_mask
        )
        grouped_xyz = ops.group_points(xyz, group_idx)  # (B, M, K, 3)
        local_xyz = grouped_xyz - new_xyz[:, :, None, :]
        if features is not None:
            grouped = ops.group_points(features, group_idx)  # (B, M, K, C)
            if self.use_xyz:
                grouped = jnp.concatenate(
                    [local_xyz.astype(grouped.dtype), grouped], axis=-1
                )
        else:
            grouped = local_xyz
        out = self.mlp(grouped)  # (B, M, K, C')
        return new_xyz, jnp.max(out, axis=2)


class FeaturePropagation(nnx.Module):
    """three-NN interpolate sparse features up to dense points + skip MLP."""

    def __init__(self, in_channels: int, mlp_channels, *, norm="batch", dtype=jnp.float32, rngs: nnx.Rngs):
        self.mlp = SharedMLP(in_channels, mlp_channels, norm=norm, dtype=dtype, rngs=rngs)
        self.out_channels = self.mlp.out_channels

    def __call__(self, dense_xyz, sparse_xyz, dense_feat, sparse_feat):
        interp = ops.three_nn_interpolate(dense_xyz, sparse_xyz, sparse_feat)
        if dense_feat is not None:
            interp = jnp.concatenate(
                [interp, dense_feat.astype(interp.dtype)], axis=-1
            )
        return self.mlp(interp)


class PN2SSG(nnx.Module):
    """Full PointNet++ SSG segmentation net over (B, N, 3) (+ features)."""

    def __init__(self, cfg: PN2SSGConfig, *, rngs: nnx.Rngs):
        dtype = jnp.dtype(cfg.dtype)
        self.cfg = cfg
        sa_layers = []
        c_in = cfg.in_channels
        sa_out = [c_in]
        for sa_cfg in cfg.sa:
            sa = SetAbstraction(
                c_in,
                sa_cfg.npoint,
                sa_cfg.radius,
                sa_cfg.nsample,
                sa_cfg.mlp_channels,
                use_xyz=cfg.use_xyz,
                norm=cfg.norm,
                dtype=dtype,
                rngs=rngs,
            )
            sa_layers.append(sa)
            c_in = sa.out_channels
            sa_out.append(c_in)
        self.sa_layers = nnx.List(sa_layers)

        fp_layers = []
        # FP goes coarsest->finest: fp[i] fuses sa_out[-(i+1)] (interp) with
        # skip sa_out[-(i+2)].
        c_sparse = sa_out[-1]
        for i, fp_channels in enumerate(cfg.fp_channels):
            skip_c = sa_out[-(i + 2)]
            fp = FeaturePropagation(
                c_sparse + skip_c, fp_channels, norm=cfg.norm, dtype=dtype, rngs=rngs
            )
            fp_layers.append(fp)
            c_sparse = fp.out_channels
        self.fp_layers = nnx.List(fp_layers)

        self.head_mlp = SharedMLP(
            c_sparse, (cfg.head_channels,), norm=cfg.norm, dtype=dtype, rngs=rngs
        )
        self.dropout = nnx.Dropout(cfg.dropout, rngs=rngs)
        self.head = nnx.Linear(
            cfg.head_channels, cfg.num_classes, dtype=dtype, param_dtype=jnp.float32, rngs=rngs
        )

    def __call__(self, xyz, features=None, valid_mask=None):
        """xyz: (B, N, 3); features: (B, N, C_in) or None.

        valid_mask: optional (B, N) bool for PADDED inputs. The chunk
        pipeline guarantees exactly-N valid points (sampling with
        replacement, data/pipeline.sample_chunk_points), so the production
        path passes None; callers feeding padded point sets MUST pass the
        mask — only the first SA level needs it (masked FPS selects only
        valid centroids, so every coarser level is all-valid), and output
        rows at invalid positions are garbage to be discarded.

        Returns per-point logits (B, N, num_classes) float32."""
        xyz = xyz.astype(jnp.float32)
        if features is not None:
            features = features.astype(jnp.dtype(self.cfg.dtype))
        xyzs = [xyz]
        feats = [features]
        for i, sa in enumerate(self.sa_layers):
            xyz, features = sa(xyz, features, valid_mask if i == 0 else None)
            xyzs.append(xyz)
            feats.append(features)
        # feature propagation back up
        sparse_feat = feats[-1]
        for i, fp in enumerate(self.fp_layers):
            dense_xyz = xyzs[-(i + 2)]
            sparse_xyz = xyzs[-(i + 1)]
            dense_feat = feats[-(i + 2)]
            sparse_feat = fp(dense_xyz, sparse_xyz, dense_feat, sparse_feat)
        out = self.head_mlp(sparse_feat)
        out = self.dropout(out)
        return self.head(out).astype(jnp.float32)
