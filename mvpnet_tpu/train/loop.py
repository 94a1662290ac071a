"""Training loop: build everything from cfg, iterate with periodic
validation / checkpointing / logging.

Capability-equivalent of the reference train scripts' ``train()`` /
``validate()`` (mvpnet/train_2d.py, train_3d.py UNVERIFIED; SURVEY.md §3.1):
iteration-based loop, chunk-level val with best-mIoU tracking, auto-resume.
"""
from __future__ import annotations

import time

import jax
import numpy as np
from flax import nnx

from mvpnet_tpu.config import Config, save_config
from mvpnet_tpu.data.pipeline import PrefetchIterator, build_dataset
from mvpnet_tpu.dist import bootstrap
from mvpnet_tpu.dist.mesh import make_mesh, replicated
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.checkpoint import Checkpointer, freeze_filter, warm_start_2d
from mvpnet_tpu.train.metrics import iou_from_confusion
from mvpnet_tpu.train.solver import build_optimizer
from mvpnet_tpu.train.step import make_eval_step, make_train_step
from mvpnet_tpu.utils.logger import MetricLogger, setup_logger
from mvpnet_tpu.utils.writer import MetricWriter


def evaluate(model, eval_step, val_iter, num_batches: int, num_classes: int, set_train_fn=None):
    """Chunk-level validation: accumulate the confusion matrix on device."""
    model.eval()
    cm = None
    losses = []
    for _ in range(num_batches):
        batch = next(val_iter)
        m = eval_step(model, batch)
        cm = m["confusion"] if cm is None else cm + m["confusion"]
        losses.append(m["loss"])
    if set_train_fn is not None:
        set_train_fn()
    else:
        model.train()
    iou, miou = iou_from_confusion(cm)
    return {
        "miou": float(miou),
        "loss": float(np.mean([float(l) for l in losses])),
        "iou": np.asarray(iou),
    }


def train(cfg: Config, *, max_steps: int | None = None, resume: bool = True):
    """Run training; returns (model, final val metrics)."""
    bootstrap.initialize()  # multi-host control plane; single-host no-op
    primary = bootstrap.is_primary()
    logger = setup_logger(output_dir=cfg.output_dir if primary else None)
    if primary:
        save_config(cfg, f"{cfg.output_dir}/config.yaml")
    logger.info(
        "devices: %s (process %d/%d)",
        jax.devices(),
        jax.process_index(),
        jax.process_count(),
    )

    rngs = nnx.Rngs(cfg.train.seed)
    model, loss_fn, metric_fn = build_model(cfg, rngs=rngs)

    # Data-parallel mesh (SURVEY.md §2.3 DP row): params replicated, batches
    # sharded over the data axis by the prefetcher. Single device: plain jit.
    mesh = make_mesh(cfg.mesh) if jax.device_count() > 1 else None
    if mesh is not None:
        logger.info("mesh: %s", dict(mesh.shape))
        nnx.update(model, jax.device_put(nnx.state(model), replicated(mesh)))
        # pin batch-local index ops (kNN/FPS/ball-query/3NN) to their shards:
        # without this the SPMD partitioner all-gathers their top_k operands
        # (15.7 GB/step at config-#2 DP — runs/r4_comm_model.json)
        from mvpnet_tpu import ops

        ops.set_data_mesh(mesh)
    else:
        from mvpnet_tpu import ops

        ops.set_data_mesh(None)  # clear any mesh a previous run installed
    sp_specs = None
    if (
        mesh is not None
        and mesh.shape.get("space", 1) > 1
        and hasattr(model, "aggregation")
    ):
        # space-sharded training: ring fusion inside the jitted step, view /
        # point / pixel axes sharded over space (dist/train_sp.py)
        from mvpnet_tpu.dist.train_sp import batch_specs, install_space_fusion

        install_space_fusion(model, mesh)
        sp_specs = batch_specs
        logger.info("space-sharded training enabled (space=%d)", cfg.mesh.space)

    if cfg.model.unet.torch_weights and hasattr(model, "net_2d"):
        from mvpnet_tpu.models.unet import load_torch_resnet34_file

        keys = load_torch_resnet34_file(
            model.net_2d.encoder, cfg.model.unet.torch_weights
        )
        logger.info(
            "imported torchvision resnet34 encoder from %s (%d keys)",
            cfg.model.unet.torch_weights,
            len(keys),
        )

    if cfg.model.pretrained_2d and hasattr(model, "net_2d"):
        loaded = warm_start_2d(model, cfg.model.pretrained_2d)
        logger.info("2D warm-start from %s: %s", cfg.model.pretrained_2d, loaded)

    wrt = freeze_filter(cfg.model.freeze_2d)
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=wrt)
    if mesh is not None:
        nnx.update(optimizer, jax.device_put(nnx.state(optimizer), replicated(mesh)))

    def set_train():
        model.train()
        if cfg.model.freeze_2d and hasattr(model, "net_2d"):
            # frozen 2D net: params out of the optimizer AND batch stats frozen
            model.net_2d.eval()

    ckpt = Checkpointer(f"{cfg.output_dir}/checkpoints", keep=cfg.train.ckpt_keep)
    start_step = 0
    if resume:
        restored = ckpt.restore(model, optimizer)
        if restored is not None:
            start_step = restored + 1
            logger.info("resumed from step %d", restored)

    train_step = make_train_step(cfg, loss_fn, metric_fn)
    eval_step = make_eval_step(cfg, loss_fn, metric_fn)

    # each host loads its slice of the global batch; the prefetcher assembles
    # the globally-sharded array (dist/bootstrap.py)
    local_bs = bootstrap.global_batch_to_local(cfg.train.batch_size)
    put_fn = None
    if mesh is not None:
        put_fn = lambda b: bootstrap.make_global_batch(
            mesh, b, specs=sp_specs(b) if sp_specs else None
        )
    train_ds = build_dataset(
        cfg.data,
        batch_size=local_bs,
        training=True,
        seed=cfg.train.seed + jax.process_index(),
    )
    val_ds = build_dataset(
        cfg.data,
        batch_size=local_bs,
        training=False,
        seed=cfg.train.seed + 1000 + jax.process_index(),
    )
    train_iter = PrefetchIterator(
        train_ds,
        prefetch=cfg.data.prefetch,
        num_threads=cfg.data.num_workers,
        put_fn=put_fn,
        pack=cfg.data.packed_transfer,
    )
    val_iter = PrefetchIterator(
        val_ds, prefetch=1, num_threads=2, put_fn=put_fn,
        pack=cfg.data.packed_transfer,
    )

    key = jax.random.key(cfg.train.seed)
    meters = MetricLogger()
    writer = MetricWriter(cfg.output_dir) if primary else None
    best_miou = -1.0
    total = max_steps if max_steps is not None else cfg.train.max_steps
    set_train()
    val_metrics: dict = {}

    t0 = time.perf_counter()
    for step in range(start_step, total):
        if cfg.train.profile_stop > cfg.train.profile_start:
            # jax.profiler trace window (SURVEY.md §5 tracing row)
            if step == cfg.train.profile_start:
                jax.profiler.start_trace(f"{cfg.output_dir}/profile")
            elif step == cfg.train.profile_stop:
                jax.profiler.stop_trace()
        batch = next(train_iter)
        meters.tick("data_time")
        key, sub = jax.random.split(key)
        m = train_step(model, optimizer, batch, sub)
        meters.update(loss=m["loss"], accuracy=m["accuracy"])
        meters.tick("batch_time")

        if (step + 1) % cfg.train.log_every == 0 or step == start_step:
            chunks_s = cfg.train.batch_size / max(
                meters.meters["batch_time"].avg + meters.meters["data_time"].avg,
                1e-9,
            )
            logger.info(
                "step %d/%d  %s  chunks/s: %.2f", step + 1, total, meters, chunks_s
            )
            if writer:
                writer.write(
                    step + 1,
                    {
                        "loss": meters.meters["loss"].avg,
                        "accuracy": meters.meters["accuracy"].avg,
                        "chunks_per_sec": chunks_s,
                    },
                    prefix="train/",
                )

        if (step + 1) % cfg.train.val_every == 0 or step + 1 == total:
            val_metrics = evaluate(
                model,
                eval_step,
                val_iter,
                cfg.train.val_steps,
                cfg.data.num_classes,
                set_train_fn=set_train,
            )
            logger.info(
                "val @%d  loss: %.4f  mIoU: %.4f",
                step + 1,
                val_metrics["loss"],
                val_metrics["miou"],
            )
            best_miou = max(best_miou, val_metrics["miou"])
            if writer:
                writer.write(
                    step + 1,
                    {"loss": val_metrics["loss"], "miou": val_metrics["miou"]},
                    prefix="val/",
                )

        if (step + 1) % cfg.train.ckpt_every == 0 or step + 1 == total:
            ckpt.save(step, model, optimizer, metrics={"miou": val_metrics.get("miou", 0.0)})

    ckpt.wait()
    train_iter.close()
    val_iter.close()
    wall = time.perf_counter() - t0
    steps_run = max(total - start_step, 1)
    logger.info(
        "done: %d steps in %.1fs (%.2f chunks/s), best mIoU %.4f",
        steps_run,
        wall,
        steps_run * cfg.train.batch_size / wall,
        best_miou,
    )
    ckpt.close()
    if writer:
        writer.close()
    return model, val_metrics
