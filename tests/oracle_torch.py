"""Independent torch-CPU implementation of the full MVPNet3D forward.

This is the SURVEY.md §4 item-5 "parity gate": an oracle built from torch
convolutions + numpy/scipy point ops (the same oracles test_ops.py validates
the jnp/Pallas ops against), loaded with the SAME weights as the NNX model.
Nothing here shares code with mvpnet_tpu/ — torch conv/BN/linear kernels,
scipy cKDTree kNN, and the pure-python FPS/ball-query oracles form a fully
independent compute path, so chunk-level logit agreement bounds silent
semantic drift (BN semantics, padding semantics, FP ordering) of the whole
net, which is the only available proxy for the reference-mIoU target while
the reference mount is empty (VERDICT round 1, missing #1).

Weight mapping conventions (flax NNX -> torch):
  nnx.Linear kernel (in, out)        -> torch Linear weight (out, in): .T
  nnx.Conv kernel (kh, kw, in, out)  -> torch Conv2d weight (out, in, kh, kw)
  nnx.BatchNorm scale/bias/mean/var  -> torch BN weight/bias/running_{mean,var}
Spatial semantics: flax 'SAME' padding is TensorFlow-style (asymmetric for
even sizes under stride 2) — reproduced here with explicit F.pad, NOT torch's
symmetric `padding=` argument.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from scipy.spatial import cKDTree

# ---------------------------------------------------------------------------
# numpy point-op oracles (independent of mvpnet_tpu.ops)
# ---------------------------------------------------------------------------


def fps_np(points: np.ndarray, npoint: int) -> np.ndarray:
    """Sequential farthest point sampling, seeded at index 0. (B,N,3)->(B,M)."""
    B, N, _ = points.shape
    out = np.zeros((B, npoint), np.int64)
    for b in range(B):
        dist = np.full(N, np.inf)
        last = 0
        for i in range(1, npoint):
            d = np.sum((points[b] - points[b, last]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            last = int(np.argmax(dist))
            out[b, i] = last
    return out


def ball_query_np(centers, points, radius, nsample):
    """First-nsample in-radius hits in index order; pad with the first hit;
    empty ball falls back to the nearest point."""
    B, M, _ = centers.shape
    idx = np.zeros((B, M, nsample), np.int64)
    for b in range(B):
        tree = cKDTree(points[b])
        d2 = np.sum(
            (centers[b][:, None, :] - points[b][None, :, :]) ** 2, axis=-1
        )
        for m in range(M):
            hits = np.nonzero(d2[m] < radius * radius)[0][:nsample]
            if len(hits) == 0:
                idx[b, m, :] = np.argmin(d2[m])
            else:
                idx[b, m, : len(hits)] = hits
                idx[b, m, len(hits) :] = hits[0]
        del tree
    return idx


def knn_np(queries, refs, k):
    """(B,M,3),(B,N,3) -> idx (B,M,k) via cKDTree (float64 internally)."""
    B, M, _ = queries.shape
    idx = np.zeros((B, M, k), np.int64)
    for b in range(B):
        _, i = cKDTree(refs[b]).query(queries[b], k=k)
        idx[b] = i.reshape(M, k)
    return idx


def three_nn_weights_np(dense, sparse, eps=1e-8):
    """3-NN indices + inverse-squared-distance weights (normalized)."""
    B, N, _ = dense.shape
    idx = np.zeros((B, N, 3), np.int64)
    w = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        d, i = cKDTree(sparse[b]).query(dense[b], k=3)
        wi = 1.0 / (d.astype(np.float32) ** 2 + eps)
        w[b] = wi / wi.sum(axis=1, keepdims=True)
        idx[b] = i
    return idx, w


def group_torch(features: torch.Tensor, idx: np.ndarray) -> torch.Tensor:
    """(B,N,C) gather by (B,M,K) -> (B,M,K,C); differentiable in features."""
    B, M, K = idx.shape
    C = features.shape[-1]
    flat = torch.from_numpy(idx.reshape(B, M * K, 1).copy()).expand(B, M * K, C)
    return torch.gather(features, 1, flat).reshape(B, M, K, C)


# ---------------------------------------------------------------------------
# TF-SAME spatial helpers (flax nnx.Conv / nnx.max_pool semantics)
# ---------------------------------------------------------------------------


def _same_pad(x_nchw: torch.Tensor, k: int, s: int, value: float = 0.0):
    h, w = x_nchw.shape[2], x_nchw.shape[3]
    ph = max((math.ceil(h / s) - 1) * s + k - h, 0)
    pw = max((math.ceil(w / s) - 1) * s + k - w, 0)
    return F.pad(
        x_nchw, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2), value=value
    )


def _np(x) -> np.ndarray:
    try:
        return np.asarray(x[...])  # nnx.Variable and ndarray both support this
    except TypeError:
        return np.asarray(x)


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(_np(x), dtype=np.float32))


# ---------------------------------------------------------------------------
# torch mirrors of the NNX blocks — constructors copy weights from NNX modules
# ---------------------------------------------------------------------------


class TorchBN(torch.nn.Module):
    """Eval-mode BatchNorm over the trailing channel of any (..., C) tensor,
    pooling semantics identical to blocks.apply_norm (flatten leading dims)."""

    def __init__(self, nnx_bn):
        super().__init__()
        c = _np(nnx_bn.scale).shape[0]
        self.bn = torch.nn.BatchNorm1d(c, eps=nnx_bn.epsilon)
        with torch.no_grad():
            self.bn.weight.copy_(_t(nnx_bn.scale))
            self.bn.bias.copy_(_t(nnx_bn.bias))
            self.bn.running_mean.copy_(_t(nnx_bn.mean))
            self.bn.running_var.copy_(_t(nnx_bn.var))
        self.bn.eval()

    def forward(self, x):
        shape = x.shape
        return self.bn(x.reshape(-1, shape[-1])).reshape(shape)


class TorchSharedMLP(torch.nn.Module):
    """Linear -> BN -> ReLU stacks over the trailing dim (blocks.SharedMLP)."""

    def __init__(self, nnx_mlp):
        super().__init__()
        self.linears = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        for lin, norm in zip(nnx_mlp.layers, nnx_mlp.norms):
            kernel = _t(lin.kernel)  # (in, out)
            tl = torch.nn.Linear(
                kernel.shape[0], kernel.shape[1], bias=lin.bias is not None
            )
            with torch.no_grad():
                tl.weight.copy_(kernel.T)
                if lin.bias is not None:
                    tl.bias.copy_(_t(lin.bias))
            self.linears.append(tl)
            self.norms.append(
                TorchBN(norm) if norm is not None else torch.nn.Identity()
            )

    def forward(self, x):
        for lin, norm in zip(self.linears, self.norms):
            x = F.relu(norm(lin(x)))
        return x


class TorchConvBNRelu(torch.nn.Module):
    """NHWC in/out; TF-SAME conv -> BN -> optional ReLU (blocks.ConvBNRelu)."""

    def __init__(self, nnx_block):
        super().__init__()
        kernel = _t(nnx_block.conv.kernel)  # (kh, kw, in, out)
        self.k = kernel.shape[0]
        self.s = nnx_block.conv.strides[0]
        self.conv = torch.nn.Conv2d(
            kernel.shape[2],
            kernel.shape[3],
            self.k,
            stride=self.s,
            padding=0,
            bias=False,
        )
        with torch.no_grad():
            self.conv.weight.copy_(kernel.permute(3, 2, 0, 1))
        self.norm = (
            TorchBN(nnx_block.norm)
            if nnx_block.norm is not None
            else torch.nn.Identity()
        )
        self.use_relu = nnx_block.use_relu

    def forward(self, x_nhwc):
        x = x_nhwc.permute(0, 3, 1, 2)
        x = self.conv(_same_pad(x, self.k, self.s))
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        return F.relu(x) if self.use_relu else x


class TorchBasicBlock(torch.nn.Module):
    def __init__(self, nnx_block):
        super().__init__()
        self.conv1 = TorchConvBNRelu(nnx_block.conv1)
        self.conv2 = TorchConvBNRelu(nnx_block.conv2)
        self.down = (
            TorchConvBNRelu(nnx_block.down) if nnx_block.down is not None else None
        )

    def forward(self, x):
        identity = x if self.down is None else self.down(x)
        return F.relu(self.conv2(self.conv1(x)) + identity)


class TorchUNet(torch.nn.Module):
    """Mirror of models.unet.UNetResNet34 (NHWC tensors throughout)."""

    def __init__(self, nnx_unet):
        super().__init__()
        enc = nnx_unet.encoder
        stem_kernel = _t(enc.stem.kernel)  # (7,7,in,base)
        self.stem = torch.nn.Conv2d(
            stem_kernel.shape[2], stem_kernel.shape[3], 7, stride=2, bias=False
        )
        with torch.no_grad():
            self.stem.weight.copy_(stem_kernel.permute(3, 2, 0, 1))
        self.stem_norm = TorchBN(enc.stem_norm)
        self.stages = torch.nn.ModuleList(
            torch.nn.ModuleList(TorchBasicBlock(b) for b in stage)
            for stage in enc.stages
        )
        self.decoders = torch.nn.ModuleList(
            TorchConvBNRelu(d) for d in nnx_unet.decoders
        )
        self.final = TorchConvBNRelu(nnx_unet.final)
        head_kernel = _t(nnx_unet.seg_head.kernel)  # (1,1,in,out)
        self.seg_head = torch.nn.Conv2d(
            head_kernel.shape[2], head_kernel.shape[3], 1, bias=True
        )
        with torch.no_grad():
            self.seg_head.weight.copy_(head_kernel.permute(3, 2, 0, 1))
            self.seg_head.bias.copy_(_t(nnx_unet.seg_head.bias))

    @staticmethod
    def _resize(x_nhwc, hw):
        return (
            F.interpolate(
                x_nhwc.permute(0, 3, 1, 2),
                size=tuple(hw),
                mode="bilinear",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .contiguous()
        )

    def forward(self, images_nhwc):
        x = images_nhwc.permute(0, 3, 1, 2)
        x = self.stem(_same_pad(x, 7, 2)).permute(0, 2, 3, 1)
        x = F.relu(self.stem_norm(x))
        feats = [x]
        x = x.permute(0, 3, 1, 2)
        x = F.max_pool2d(_same_pad(x, 3, 2, value=-torch.inf), 3, stride=2)
        x = x.permute(0, 2, 3, 1)
        for stage in self.stages:
            for block in stage:
                x = block(x)
            feats.append(x)
        skips = feats[:-1]
        y = feats[-1]
        for dec, skip in zip(self.decoders, reversed(skips)):
            y = self._resize(y, skip.shape[1:3])
            y = dec(torch.cat([y, skip], dim=-1))
        y = self._resize(y, images_nhwc.shape[1:3])
        features = self.final(y)
        logits = self.seg_head(features.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return features, logits


class TorchFeatureAggregation(torch.nn.Module):
    def __init__(self, nnx_agg):
        super().__init__()
        self.cfg = nnx_agg.cfg
        self.mlp = TorchSharedMLP(nnx_agg.mlp)

    def forward(self, points, grouped_xyz, grouped_feat):
        if self.cfg.use_relative_xyz:
            rel = grouped_xyz - points[:, :, None, :]
            grouped_feat = torch.cat([grouped_feat, rel], dim=-1)
        out = self.mlp(grouped_feat)  # (B, N, K, C')
        if self.cfg.reduction == "max":
            return out.max(dim=2).values
        if self.cfg.reduction == "sum":
            return out.sum(dim=2)
        return out.mean(dim=2)


class TorchSetAbstraction(torch.nn.Module):
    def __init__(self, nnx_sa):
        super().__init__()
        self.npoint = nnx_sa.npoint
        self.radius = nnx_sa.radius
        self.nsample = nnx_sa.nsample
        self.use_xyz = nnx_sa.use_xyz
        self.mlp = TorchSharedMLP(nnx_sa.mlp)

    def forward(self, xyz, features):
        xyz_np = xyz.detach().numpy()
        centroid_idx = fps_np(xyz_np, self.npoint)  # (B, M)
        new_xyz = torch.gather(
            xyz, 1, torch.from_numpy(centroid_idx[..., None].copy()).expand(-1, -1, 3)
        )
        group_idx = ball_query_np(
            new_xyz.detach().numpy(), xyz_np, self.radius, self.nsample
        )
        grouped_xyz = group_torch(xyz, group_idx)
        local_xyz = grouped_xyz - new_xyz[:, :, None, :]
        if features is not None:
            grouped = group_torch(features, group_idx)
            if self.use_xyz:
                grouped = torch.cat([local_xyz, grouped], dim=-1)
        else:
            grouped = local_xyz
        return new_xyz, self.mlp(grouped).max(dim=2).values


class TorchFeaturePropagation(torch.nn.Module):
    def __init__(self, nnx_fp):
        super().__init__()
        self.mlp = TorchSharedMLP(nnx_fp.mlp)

    def forward(self, dense_xyz, sparse_xyz, dense_feat, sparse_feat):
        idx, w = three_nn_weights_np(
            dense_xyz.detach().numpy(), sparse_xyz.detach().numpy()
        )
        neigh = group_torch(sparse_feat, idx)  # (B, N, 3, C)
        interp = (neigh * torch.from_numpy(w)[..., None]).sum(dim=2)
        if dense_feat is not None:
            interp = torch.cat([interp, dense_feat], dim=-1)
        return self.mlp(interp)


class TorchPN2SSG(torch.nn.Module):
    def __init__(self, nnx_pn2):
        super().__init__()
        self.sa_layers = torch.nn.ModuleList(
            TorchSetAbstraction(sa) for sa in nnx_pn2.sa_layers
        )
        self.fp_layers = torch.nn.ModuleList(
            TorchFeaturePropagation(fp) for fp in nnx_pn2.fp_layers
        )
        self.head_mlp = TorchSharedMLP(nnx_pn2.head_mlp)
        head_kernel = _t(nnx_pn2.head.kernel)  # (in, out)
        self.head = torch.nn.Linear(head_kernel.shape[0], head_kernel.shape[1])
        with torch.no_grad():
            self.head.weight.copy_(head_kernel.T)
            self.head.bias.copy_(_t(nnx_pn2.head.bias))
        # dropout is identity in eval mode (the parity gate runs eval only)

    def forward(self, xyz, features=None):
        xyzs = [xyz]
        feats = [features]
        for sa in self.sa_layers:
            xyz, features = sa(xyz, features)
            xyzs.append(xyz)
            feats.append(features)
        sparse_feat = feats[-1]
        for i, fp in enumerate(self.fp_layers):
            sparse_feat = fp(
                xyzs[-(i + 2)], xyzs[-(i + 1)], feats[-(i + 2)], sparse_feat
            )
        return self.head(self.head_mlp(sparse_feat))


class TorchMVPNet3D(torch.nn.Module):
    """Full fusion net mirror; constructor copies all weights from the NNX
    model (which must be in eval mode so BN stats are frozen on both sides)."""

    def __init__(self, nnx_model):
        super().__init__()
        self.k = nnx_model.cfg.aggregation.k
        self.net_2d = TorchUNet(nnx_model.net_2d)
        self.aggregation = TorchFeatureAggregation(nnx_model.aggregation)
        self.net_3d = TorchPN2SSG(nnx_model.net_3d)

    def forward(self, batch):
        points = batch["points"]  # (B, N, 3) torch
        images = batch["images"]  # (B, V, H, W, 3) torch
        image_xyz = batch["image_xyz"]  # (B, V, H, W, 3) torch
        B, V, H, W, _ = images.shape

        feat2d, logits_2d = self.net_2d(images.reshape(B * V, H, W, 3))
        C2d = feat2d.shape[-1]
        pixel_feat = feat2d.reshape(B, V * H * W, C2d)
        pixel_xyz = image_xyz.reshape(B, V * H * W, 3)

        knn_idx = knn_np(points.detach().numpy(), pixel_xyz.detach().numpy(), self.k)
        grouped_feat = group_torch(pixel_feat, knn_idx)
        grouped_xyz = group_torch(pixel_xyz, knn_idx)

        fused = self.aggregation(points, grouped_xyz, grouped_feat)
        logits_3d = self.net_3d(points, fused)
        return logits_3d, logits_2d.reshape(B, V, H, W, -1)


def torch_cross_entropy(logits, labels, ignore_label=-100):
    """Mean CE over non-ignored elements (mirror of train.metrics.cross_entropy)."""
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_labels = labels.reshape(-1).to(torch.long)
    return F.cross_entropy(flat_logits, flat_labels, ignore_index=ignore_label)
