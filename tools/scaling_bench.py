"""Scaling-efficiency harness (BASELINE: >=80% at 2 hosts).

Measures jitted train-step throughput (chunks/s) on data-parallel meshes of
1, 2, 4, ... devices with the per-device batch held constant (weak scaling),
and reports efficiency = throughput(n) / (n * throughput(1)).

On a real multi-chip slice, run one process per host:
  python tools/scaling_bench.py --batch-per-device 4
On a dev box, exercise the wiring on virtual CPU devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --tiny

The reference has no analog (single GPU, SURVEY.md §2.3); this harness is the
capability BASELINE.json's scaling target is scored with.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(n_devices: int, batch_per_device: int, tiny: bool, iters: int) -> float:
    import jax
    from flax import nnx

    from mvpnet_tpu.config import Config, MeshConfig
    from mvpnet_tpu.dist.mesh import make_mesh, replicated, shard_batch
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step
    from __graft_entry__ import _example_batch

    if tiny:
        from tests.test_models import tiny_config

        cfg = tiny_config()
        N, V, H, W, C = 64, 2, 16, 16, 5
    else:
        cfg = Config()
        N, V, H, W, C = (
            cfg.data.num_points,
            cfg.data.num_views_train,
            cfg.data.image_height,
            cfg.data.image_width,
            cfg.data.num_classes,
        )

    mesh = make_mesh(MeshConfig(data=n_devices, space=1), devices=jax.devices()[:n_devices])
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    nnx.update(model, jax.device_put(nnx.state(model), replicated(mesh)))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    nnx.update(optimizer, jax.device_put(nnx.state(optimizer), replicated(mesh)))
    train_step = make_train_step(cfg, loss_fn, metric_fn)

    B = batch_per_device * n_devices
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, _example_batch(rng, B=B, N=N, V=V, H=H, W=W, num_classes=C))

    key = jax.random.key(0)
    m = train_step(model, optimizer, batch, key)  # compile
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _i in range(iters):
        m = train_step(model, optimizer, batch, key)
    _ = float(m["loss"])  # materialize
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU wiring check)")
    args = ap.parse_args()

    if args.tiny:
        # --tiny is the virtual-mesh wiring run: force the 8-device CPU
        # backend regardless of the pinned axon platform (jax is pre-imported
        # at interpreter startup, so env vars alone are too late — conftest
        # pattern)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from mvpnet_tpu.dist import bootstrap

    bootstrap.initialize()
    n = jax.device_count()
    sizes = [1]
    while sizes[-1] * 2 <= n:
        sizes.append(sizes[-1] * 2)
    if jax.process_count() > 1:
        # Multi-controller JAX: a sub-mesh that excludes some processes'
        # devices makes jit/shard_batch fail on those processes (every
        # process must participate in every collective program). Only the
        # full-slice point is measurable per launch; sub-slice points come
        # from separate smaller launches.
        sizes = [s for s in sizes if s == n]
        print(
            json.dumps(
                {
                    "note": "multi-process run: only the full-slice point is "
                    "measured; get smaller points from smaller slices",
                    "processes": jax.process_count(),
                }
            ),
            flush=True,
        )

    results = {}
    for s in sizes:
        tput = measure(s, args.batch_per_device, args.tiny, args.iters)
        eff = tput / (s * results[1]) if 1 in results else 1.0
        results[s] = tput
        print(
            json.dumps(
                {
                    "devices": s,
                    "chunks_per_sec": round(tput, 2),
                    "scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
