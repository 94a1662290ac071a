"""Model registry: build_model(cfg) -> (model, loss_fn, metric_fn).

Reference equivalent: ``build_model_sem_seg_2d`` / ``build_model_mvpnet_3d``
(mvpnet/models/build.py, UNVERIFIED; SURVEY.md §2.2 "Model registry").
"""
from __future__ import annotations

from flax import nnx

from flax import nnx as _nnx

from mvpnet_tpu.config import Config, ModelConfig
from mvpnet_tpu.models.fusion import MVPNet3D
from mvpnet_tpu.models.pointnet2 import PN2SSG
from mvpnet_tpu.models.unet import UNetResNet34
from mvpnet_tpu.train import metrics as M


class PN2Seg(_nnx.Module):
    """PointNet++ baseline wrapper: standard chunk batch -> (logits, None).

    The reference's ablation models (SURVEY.md §6 rows 3-4): xyz-only
    (``pn2.in_channels == 0``) or xyz + per-point RGB (``in_channels == 3``;
    requires ``data.include_colors=true`` so the pipeline ships colors and
    ``prepare_batch`` forwards them). Returns ``(logits_3d, None)`` so the
    train/eval steps and whole-scene eval unpack it exactly like MVPNet3D's
    ``(logits_3d, logits_2d)`` (round-3 VERDICT weak #1: the bare PN2SSG
    crashed through ``make_train_step``, which feeds a batch dict).
    """

    def __init__(self, cfg: ModelConfig, *, rngs):
        pn2 = cfg.pn2
        if pn2.in_channels not in (0, 3):
            raise ValueError(
                "model.name=pn2ssg supports pn2.in_channels 0 (xyz-only) or "
                f"3 (xyz+RGB), got {pn2.in_channels}"
            )
        self.in_channels = pn2.in_channels
        self.net_3d = PN2SSG(pn2, rngs=rngs)

    def __call__(self, batch):
        features = None
        if self.in_channels == 3:
            if "colors" not in batch:
                raise KeyError(
                    "pn2ssg with pn2.in_channels=3 consumes per-point RGB: "
                    "set data.include_colors=true"
                )
            features = batch["colors"]
        return self.net_3d(batch["points"], features), None


class SemSeg2D(_nnx.Module):
    """2D pretraining wrapper: standard batch dict -> per-view seg logits.

    The UNet lives under the attribute name ``net_2d`` so this run's
    checkpointed param tree lines up with ``MVPNet3D.net_2d`` for the
    warm-start restore (reference train_3d loads the 2D seg checkpoint —
    SURVEY.md §3.1).
    """

    def __init__(self, cfg: ModelConfig, *, rngs):
        self.net_2d = UNetResNet34(cfg.unet, rngs=rngs)

    def __call__(self, batch):
        images = batch["images"]  # (B, V, H, W, 3)
        B, V, H, W, _ = images.shape
        feat, logits = self.net_2d(images.reshape(B * V, H, W, 3))
        return (
            feat.reshape(B, V, H, W, -1),
            logits.reshape(B, V, H, W, -1),
        )


def build_model(cfg: Config, *, rngs: nnx.Rngs):
    """Returns (model, loss_fn(model_out, batch) -> scalar,
    metric_fn(model_out, batch) -> dict)."""
    name = cfg.model.name
    ignore = cfg.data.ignore_label

    if name == "mvpnet_3d":
        model = MVPNet3D(cfg.model, rngs=rngs)
        model.remat_2d = cfg.train.remat  # HBM lever for the big configs
        aux_w = cfg.model.aux_2d_loss_weight

        def loss_fn(out, batch):
            logits_3d, logits_2d = out
            loss = M.cross_entropy(logits_3d, batch["seg_label"], ignore)
            if aux_w > 0 and "seg_label_2d" in batch:
                loss = loss + aux_w * M.cross_entropy(
                    logits_2d, batch["seg_label_2d"], ignore
                )
            return loss

        def metric_fn(out, batch):
            logits_3d, _ = out
            return {
                "accuracy": M.seg_accuracy(logits_3d, batch["seg_label"], ignore),
                "confusion": M.confusion_matrix(
                    logits_3d, batch["seg_label"], cfg.data.num_classes, ignore
                ),
            }

        return model, loss_fn, metric_fn

    if name == "sem_seg_2d":
        model = SemSeg2D(cfg.model, rngs=rngs)

        def loss_fn(out, batch):
            _, logits = out
            return M.cross_entropy(logits, batch["seg_label_2d"], ignore)

        def metric_fn(out, batch):
            _, logits = out
            return {
                "accuracy": M.seg_accuracy(logits, batch["seg_label_2d"], ignore),
                "confusion": M.confusion_matrix(
                    logits, batch["seg_label_2d"], cfg.data.num_classes, ignore
                ),
            }

        return model, loss_fn, metric_fn

    if name == "pn2ssg":
        # PointNet++ baseline, xyz-only or xyz+RGB (reference ablation
        # configs — SURVEY.md §6 rows 3-4)
        model = PN2Seg(cfg.model, rngs=rngs)

        def loss_fn(out, batch):
            logits_3d, _ = out
            return M.cross_entropy(logits_3d, batch["seg_label"], ignore)

        def metric_fn(out, batch):
            logits_3d, _ = out
            return {
                "accuracy": M.seg_accuracy(logits_3d, batch["seg_label"], ignore),
                "confusion": M.confusion_matrix(
                    logits_3d, batch["seg_label"], cfg.data.num_classes, ignore
                ),
            }

        return model, loss_fn, metric_fn

    raise ValueError(f"unknown model {name!r}")
