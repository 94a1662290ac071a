"""Real 2-process jax.distributed rehearsal on CPU (round-5 VERDICT item 2).

Every dist test and the driver dryrun run in ONE process on 8 virtual
devices; dist/bootstrap.py's multi-PROCESS paths (env-var initialize,
make_global_array cross-host assembly, global_batch_to_local, is_primary
checkpoint gating) had never executed in a 2+ process runtime. This tool
executes them for real: 2 subprocesses x 4 virtual CPU devices each, a
local TCP coordinator, one DP train step over the 8-device global mesh —
and checks the loss matches a single-process 8-device run of the same
seeded batch and model.

Run anywhere: python tools/dist_rehearsal.py
Writes runs/r5_dist_rehearsal.json.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
GLOBAL_BATCH = 16
N_PROCS = 2
DEVS_PER_PROC = 4


def _tiny_cfg():
    import dataclasses

    from mvpnet_tpu.config import (
        AggregationConfig,
        Config,
        MeshConfig,
        ModelConfig,
        PN2SSGConfig,
        SetAbstractionConfig,
        UNetConfig,
    )

    cfg = Config(
        model=ModelConfig(
            name="mvpnet_3d",
            unet=UNetConfig(
                num_classes=5,
                base_channels=8,
                stage_channels=(8, 16, 16, 32),
                stage_blocks=(1, 1, 1, 1),
                decoder_channels=(16, 16, 8, 8),
                feature_channels=8,
                dtype="float32",
            ),
            aggregation=AggregationConfig(k=3, mlp_channels=(8, 8)),
            pn2=PN2SSGConfig(
                num_classes=5,
                in_channels=8,
                sa=(
                    SetAbstractionConfig(16, 0.2, 8, (16, 16)),
                    SetAbstractionConfig(8, 0.4, 8, (16, 32)),
                ),
                fp_channels=((32,), (32, 16)),
                head_channels=16,
                dtype="float32",
            ),
        ),
        mesh=MeshConfig(data=N_PROCS * DEVS_PER_PROC, space=1),
    )
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, num_classes=5)
    )


def _global_batch():
    """The SAME seeded global batch on every process (and the baseline)."""
    import numpy as np

    from __graft_entry__ import _example_batch

    rng = np.random.default_rng(0)
    return _example_batch(rng, B=GLOBAL_BATCH, N=64, V=2, H=16, W=16, num_classes=5)


def _build_and_step(mesh, batch_arrays):
    """Build the tiny model + run ONE DP train step; returns global loss."""
    from flax import nnx

    from mvpnet_tpu import ops
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.solver import build_optimizer
    from mvpnet_tpu.train.step import make_train_step

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _tiny_cfg()
    ops.set_data_mesh(mesh)

    def _init():
        model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
        optimizer = nnx.Optimizer(
            model, build_optimizer(cfg.solver), wrt=nnx.Param
        )
        return nnx.split((model, optimizer))[1]

    # multi-controller SPMD: params/opt-state must be GLOBAL arrays. Each
    # process runs the same deterministic init INSIDE jit with replicated
    # out_shardings, so the state is born as global replicated arrays
    # (device_put of host-local state to a global sharding is rejected).
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    graphdef, _ = nnx.split((model, optimizer))
    rep = NamedSharding(mesh, P())
    state = jax.jit(_init, out_shardings=rep)()
    model, optimizer = nnx.merge(graphdef, state)

    train_step = make_train_step(cfg, loss_fn, metric_fn)
    key = jax.jit(lambda: jax.random.key(0), out_shardings=rep)()
    metrics = train_step(model, optimizer, batch_arrays, key)
    return float(metrics["loss"]), model


def worker(marker_dir: str) -> None:
    """Runs under COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars."""
    from mvpnet_tpu.dist import bootstrap

    # env-var path of bootstrap.initialize — the code under test
    multi = bootstrap.initialize()
    assert multi, "bootstrap.initialize did not activate a multi-process runtime"

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from mvpnet_tpu.dist.mesh import make_mesh

    cfg = _tiny_cfg()
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == N_PROCS, nproc
    assert jax.local_device_count() == DEVS_PER_PROC
    assert jax.device_count() == N_PROCS * DEVS_PER_PROC

    mesh = make_mesh(cfg.mesh)

    # host-sharded loading: each process materializes only ITS slice
    local_b = bootstrap.global_batch_to_local(GLOBAL_BATCH)
    assert local_b == GLOBAL_BATCH // N_PROCS
    full = _global_batch()
    local = {k: v[pid * local_b : (pid + 1) * local_b] for k, v in full.items()}

    # cross-host global-array assembly — the code under test
    gbatch = bootstrap.make_global_batch(mesh, local)
    for k, v in gbatch.items():
        assert v.shape[0] == GLOBAL_BATCH, (k, v.shape)

    loss, stepped_model = _build_and_step(mesh, gbatch)

    # primary-only write gating (the logging/metric-writer pattern)
    if bootstrap.is_primary():
        with open(os.path.join(marker_dir, f"marker_{pid}"), "w") as fh:
            fh.write("primary")
    multihost_utils.sync_global_devices("rehearsal_marker_barrier")
    markers = sorted(
        f for f in os.listdir(marker_dir) if f.startswith("marker_")
    )

    # real orbax checkpoint round-trip in the 2-process runtime — the train
    # loop's pattern (ALL processes call save/restore; orbax coordinates and
    # process 0 writes metadata). The saved model must carry GLOBAL arrays
    # (the post-step model does; a model built outside jit holds
    # process-local arrays, which orbax correctly rejects in multi-host —
    # verified by an earlier revision of this tool). Restore into a model
    # whose target state is global-replicated and check a param leaf.
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.checkpoint import Checkpointer
    from mvpnet_tpu.train.solver import build_optimizer

    cfg = _tiny_cfg()
    ck = Checkpointer(os.path.join(marker_dir, "ckpt"), keep=1)
    ck.save(0, stepped_model, metrics={"miou": 0.5})
    ck.wait()

    def _init2():
        m, _, _ = build_model(cfg, rngs=nnx.Rngs(1))  # different init
        return nnx.split(m)[1]

    model2, _, _ = build_model(cfg, rngs=nnx.Rngs(1))
    graphdef2, _ = nnx.split(model2)
    state2 = jax.jit(_init2, out_shardings=NamedSharding(mesh, P()))()
    model2 = nnx.merge(graphdef2, state2)
    step = ck.restore(model2)
    ck.close()
    leaf_a = jax.tree.leaves(nnx.state(stepped_model, nnx.Param))[0]
    leaf_b = jax.tree.leaves(nnx.state(model2, nnx.Param))[0]
    ckpt_ok = bool(step == 0 and np.allclose(np.asarray(leaf_a), np.asarray(leaf_b)))
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "pid": pid,
                "process_count": nproc,
                "global_devices": jax.device_count(),
                "local_devices": jax.local_device_count(),
                "loss": loss,
                "markers_seen": markers,
                "is_primary": bool(bootstrap.is_primary()),
                "orbax_roundtrip_ok": ckpt_ok,
            }
        ),
        flush=True,
    )


def baseline() -> None:
    """Single process, 8 virtual devices, same batch/model/step."""
    import jax

    from mvpnet_tpu.dist.mesh import make_mesh, shard_batch

    cfg = _tiny_cfg()
    assert jax.device_count() == N_PROCS * DEVS_PER_PROC
    mesh = make_mesh(cfg.mesh)
    batch = shard_batch(mesh, _global_batch())
    loss, _ = _build_and_step(mesh, batch)
    print("BASELINE_RESULT " + json.dumps({"loss": loss}), flush=True)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch() -> None:
    port = _free_port()
    env_common = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={DEVS_PER_PROC}",
        PYTHONPATH=REPO,
    )
    with tempfile.TemporaryDirectory() as marker_dir:
        procs = []
        for pid in range(N_PROCS):
            env = dict(
                env_common,
                COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                NUM_PROCESSES=str(N_PROCS),
                PROCESS_ID=str(pid),
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, __file__, "--worker", marker_dir],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                    cwd=REPO,
                )
            )
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, err = p.communicate()
            outs.append((p.returncode, out, err))

    env_base = dict(
        env_common,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={N_PROCS * DEVS_PER_PROC}",
    )
    pb = subprocess.run(
        [sys.executable, __file__, "--baseline"],
        env=env_base,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )

    result = {"workers": [], "ok": False}
    losses = []
    for rc, out, err in outs:
        rec = {"rc": rc}
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                rec.update(json.loads(line[len("WORKER_RESULT "):]))
                losses.append(rec["loss"])
        if rc != 0 or "loss" not in rec:
            rec["stderr_tail"] = err[-2000:]
        result["workers"].append(rec)

    base_loss = None
    for line in pb.stdout.splitlines():
        if line.startswith("BASELINE_RESULT "):
            base_loss = json.loads(line[len("BASELINE_RESULT "):])["loss"]
    result["baseline_loss"] = base_loss
    if pb.returncode != 0 or base_loss is None:
        result["baseline_stderr_tail"] = pb.stderr[-2000:]

    markers_ok = all(
        w.get("markers_seen") == ["marker_0"] for w in result["workers"]
    )
    losses_equal = len(losses) == N_PROCS and abs(losses[0] - losses[1]) < 1e-9
    vs_base = (
        base_loss is not None
        and losses
        and abs(losses[0] - base_loss) < 1e-5
    )
    result["markers_ok"] = markers_ok
    result["worker_losses_equal"] = losses_equal
    result["matches_single_process"] = bool(vs_base)
    result["loss_delta_vs_single_process"] = (
        abs(losses[0] - base_loss) if (losses and base_loss is not None) else None
    )
    result["ok"] = bool(
        markers_ok
        and losses_equal
        and vs_base
        and all(w.get("rc") == 0 for w in result["workers"])
        and all(w.get("orbax_roundtrip_ok") for w in result["workers"])
    )

    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    with open(os.path.join(REPO, "runs", "r5_dist_rehearsal.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.path.insert(0, REPO)
        worker(sys.argv[sys.argv.index("--worker") + 1])
    elif "--baseline" in sys.argv:
        sys.path.insert(0, REPO)
        baseline()
    else:
        launch()
