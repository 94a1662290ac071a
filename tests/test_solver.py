"""Solver factory tests: flattened-update exactness + schedule shapes."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mvpnet_tpu.config import SolverConfig
from mvpnet_tpu.train.solver import build_optimizer, build_schedule, flatten_update


def _params(rng):
    return {
        "w1": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
        "b1": jnp.asarray(rng.normal(size=(5,)), jnp.float32),
        "nested": {"w2": jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)},
    }


@pytest.mark.parametrize(
    "cfg",
    [
        SolverConfig(optimizer="adam"),
        SolverConfig(optimizer="adamw", weight_decay=0.01),
        SolverConfig(optimizer="sgd", momentum=0.9, weight_decay=0.005),
        SolverConfig(optimizer="adam", max_grad_norm=0.5),
    ],
    ids=["adam", "adamw", "sgd", "adam+clip"],
)
def test_flatten_update_matches_unflattened(rng, cfg):
    """flatten_update(tx) must produce the SAME parameter trajectory as the
    per-tensor tx for every optimizer build_optimizer constructs (these are
    all uniform elementwise transforms; the global-norm clip reduction is
    order-insensitive up to float associativity)."""
    flat_tx = build_optimizer(dataclasses.replace(cfg, flatten_update=True))
    plain_tx = build_optimizer(dataclasses.replace(cfg, flatten_update=False))

    p_flat = _params(rng)
    p_plain = jax.tree.map(jnp.copy, p_flat)
    s_flat = flat_tx.init(p_flat)
    s_plain = plain_tx.init(p_plain)

    g_rng = np.random.default_rng(7)
    for _ in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(g_rng.normal(size=p.shape), jnp.float32),
            p_plain,
        )
        u_flat, s_flat = flat_tx.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u_flat)
        u_plain, s_plain = plain_tx.update(grads, s_plain, p_plain)
        p_plain = optax.apply_updates(p_plain, u_plain)

    flat_leaves = jax.tree.leaves(p_flat)
    plain_leaves = jax.tree.leaves(p_plain)
    for a, b in zip(flat_leaves, plain_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_flatten_update_preserves_shapes_and_dtypes(rng):
    tx = flatten_update(optax.adam(1e-3))
    params = _params(rng)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert jax.tree.structure(updates) == jax.tree.structure(params)
    for u, p in zip(jax.tree.leaves(updates), jax.tree.leaves(params)):
        assert u.shape == p.shape and u.dtype == p.dtype


def test_schedule_warmup_and_floor():
    cfg = SolverConfig(
        scheduler="step", step_size=10, gamma=0.1, clip_lr=1e-5, warmup_steps=4
    )
    sched = build_schedule(cfg)
    # warmup ramps multiplicatively
    assert float(sched(0)) == pytest.approx(cfg.base_lr * 1 / 4)
    assert float(sched(3)) == pytest.approx(cfg.base_lr)
    # floor holds far into decay
    assert float(sched(1000)) == pytest.approx(1e-5)
