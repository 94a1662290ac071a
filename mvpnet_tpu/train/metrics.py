"""Losses and on-device metrics.

Reference equivalents: ``CrossEntropyLoss(ignore_index)`` + ``SegAccuracy``
(mvpnet/models/build.py, UNVERIFIED) and the confusion-matrix ``Evaluator``
in test_3d.py (SURVEY.md §2.2, §3.2). TPU-first: the confusion matrix is
accumulated on-device via one bincount over ``num_classes*label + pred``
(SURVEY.md §5 observability row) so evaluation never ships per-point
predictions to the host.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, ignore_label: int = -100, num_classes: int | None = None):
    """Mean softmax cross-entropy over non-ignored elements.

    logits: (..., C) float; labels: (...) int (ignore_label = unlabeled).
    """
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe_labels
    )
    losses = jnp.where(valid, losses, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(losses) / denom


def seg_accuracy(logits, labels, ignore_label: int = -100):
    """Fraction of non-ignored elements predicted correctly."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_label
    correct = jnp.logical_and(pred == labels, valid)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)


def confusion_matrix(logits_or_pred, labels, num_classes: int, ignore_label: int = -100):
    """(num_classes, num_classes) confusion counts, rows = true labels.

    Accepts logits (..., C) or integer predictions (...).
    """
    if logits_or_pred.ndim == labels.ndim + 1:
        pred = jnp.argmax(logits_or_pred, axis=-1)
    else:
        pred = logits_or_pred
    valid = labels != ignore_label
    idx = jnp.where(valid, labels * num_classes + pred, num_classes * num_classes)
    counts = jnp.bincount(
        idx.reshape(-1), length=num_classes * num_classes + 1
    )[:-1]
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(cm):
    """Per-class IoU + mIoU (classes absent from GT and pred are excluded
    from the mean, matching standard ScanNet evaluation)."""
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1) - tp
    iou = tp / jnp.maximum(denom, 1)
    present = denom > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(jnp.sum(present), 1)
    return iou, miou
