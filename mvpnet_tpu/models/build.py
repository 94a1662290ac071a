"""Model registry: build_model(cfg) -> (model, loss_fn, metric_fn).

Reference equivalent: ``build_model_sem_seg_2d`` / ``build_model_mvpnet_3d``
(mvpnet/models/build.py, UNVERIFIED; SURVEY.md §2.2 "Model registry").
"""
from __future__ import annotations

from flax import nnx

from mvpnet_tpu.config import Config
from mvpnet_tpu.models.fusion import MVPNet3D
from mvpnet_tpu.models.pointnet2 import PN2SSG
from mvpnet_tpu.models.unet import UNetResNet34
from mvpnet_tpu.train import metrics as M


def build_model(cfg: Config, *, rngs: nnx.Rngs):
    """Returns (model, loss_fn(model_out, batch) -> scalar,
    metric_fn(model_out, batch) -> dict)."""
    name = cfg.model.name
    ignore = cfg.data.ignore_label

    if name == "mvpnet_3d":
        model = MVPNet3D(cfg.model, rngs=rngs)

        def loss_fn(out, batch):
            logits_3d, logits_2d = out
            loss = M.cross_entropy(logits_3d, batch["seg_label"], ignore)
            if "seg_label_2d" in batch:
                loss = loss + 0.1 * M.cross_entropy(
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
        model = UNetResNet34(cfg.model.unet, rngs=rngs)

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
        # xyz-only PointNet++ baseline (reference ablation configs)
        model = PN2SSG(cfg.model.pn2, rngs=rngs)

        def loss_fn(out, batch):
            return M.cross_entropy(out, batch["seg_label"], ignore)

        def metric_fn(out, batch):
            return {
                "accuracy": M.seg_accuracy(out, batch["seg_label"], ignore),
                "confusion": M.confusion_matrix(
                    out, batch["seg_label"], cfg.data.num_classes, ignore
                ),
            }

        return model, loss_fn, metric_fn

    raise ValueError(f"unknown model {name!r}")
