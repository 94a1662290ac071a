"""Optimizer + LR scheduler factories (optax).

Capability-equivalent of the reference's ``build_optimizer`` /
``build_scheduler`` (common/solver/build.py, lr_scheduler.py UNVERIFIED;
SURVEY.md §2.2 "Solver"): Adam/SGD from cfg, Step/MultiStep/Cosine
schedules, a ClipLR-style LR floor, optional warmup and global-norm grad
clipping.
"""
from __future__ import annotations

import optax

from mvpnet_tpu.config import SolverConfig


def flatten_update(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``tx``'s update over ONE concatenated vector per pytree.

    The model's hundreds of small parameter tensors make the elementwise
    optimizer update launch/overhead-bound: ~28 ms marginal for 22M params
    (~19 GB/s effective against the v5e's ~800 GB/s HBM) — docs/PERF_NOTES.md
    round 3, which names this exact fix. Flattening turns the update into a
    few full-vector elementwise passes.

    Semantics: EXACT for uniform (unmasked) transforms — everything
    ``build_optimizer`` constructs (adam/adamw/sgd, global-norm clip, scalar
    schedules) applies the same elementwise math to every leaf, and the
    global-norm reduction is order-insensitive up to float associativity.
    Do NOT wrap per-leaf-masked transforms. Note: the optimizer checkpoint
    layout changes (one vector instead of the param tree), so resuming an
    unflattened run with ``solver.flatten_update=true`` (or vice versa)
    needs a fresh optimizer state.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(updates, state, params=None):
        gflat, unravel = ravel_pytree(updates)
        pflat = ravel_pytree(params)[0] if params is not None else None
        out, new_state = tx.update(gflat, state, pflat)
        return unravel(out), new_state

    return optax.GradientTransformation(init, update)


def build_schedule(cfg: SolverConfig):
    if cfg.scheduler == "none":
        base = optax.constant_schedule(cfg.base_lr)
    elif cfg.scheduler == "step":
        base = optax.exponential_decay(
            cfg.base_lr,
            transition_steps=cfg.step_size,
            decay_rate=cfg.gamma,
            staircase=True,
        )
    elif cfg.scheduler == "multistep":
        boundaries = {m: cfg.gamma for m in cfg.milestones}
        base = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
    elif cfg.scheduler == "cosine":
        base = optax.cosine_decay_schedule(cfg.base_lr, cfg.step_size)
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")

    floor = cfg.clip_lr

    def clipped(step):
        import jax.numpy as jnp

        return jnp.maximum(base(step), floor)

    sched = clipped if floor > 0 else base
    if cfg.warmup_steps > 0:
        # Multiplicative warmup over the GLOBAL-step schedule: the decay
        # schedule keeps counting from step 0 (matching a global-step StepLR
        # with warmup), rather than join_schedules which would restart the
        # decay clock at the warmup boundary and delay every decay.
        decay, warmup_steps = sched, cfg.warmup_steps

        def warmed(step):
            import jax.numpy as jnp

            frac = jnp.minimum(1.0, (step + 1) / warmup_steps)
            return decay(step) * frac

        sched = warmed
    return sched


def build_optimizer(cfg: SolverConfig) -> optax.GradientTransformation:
    sched = build_schedule(cfg)
    if cfg.optimizer == "adam":
        tx = optax.adam(sched)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum, nesterov=False)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    parts = []
    if cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts.append(tx)
    if cfg.optimizer == "sgd" and cfg.weight_decay > 0:
        parts.insert(0, optax.add_decayed_weights(cfg.weight_decay))
    out = optax.chain(*parts) if len(parts) > 1 else parts[0]
    if cfg.flatten_update:
        out = flatten_update(out)
    return out
