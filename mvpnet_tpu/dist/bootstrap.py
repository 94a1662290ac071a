"""Multi-host bootstrap for TPU slices.

The reference has NO distributed runtime (single process, single GPU —
SURVEY.md §2.3/§2.4); the TPU-native capability is `jax.distributed` for the
DCN control plane plus GSPMD collectives over ICI/DCN emitted from sharding
annotations (dist/mesh.py). This module is the thin entry wiring:

  * ``initialize(cfg)`` — idempotent `jax.distributed.initialize` with three
    sources of truth, in priority order: explicit config, standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, as set by launchers),
    and TPU-pod auto-detection (no args: libtpu/metadata discovery). On a
    single host with no coordinator configured it is a no-op — every code
    path stays valid on one process.
  * ``is_primary()`` — process-0 guard for logging / checkpointing / metric
    writing (multi-host jobs must write once).
  * ``global_batch_to_local(...)`` — the per-host slice of a global batch
    size for host-sharded data loading.
  * ``make_global_array(...)`` — assemble a jax.Array sharded over the mesh
    from each host's local shard (the multi-host analog of
    dist.mesh.shard_batch, which handles the single-host fast path).
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvpnet_tpu.dist.mesh import DATA_AXIS

logger = logging.getLogger(__name__)

_initialized = False


def _distributed_client_active() -> bool:
    """True iff jax.distributed.initialize has already run in this process.

    Deliberately does NOT call jax.process_count(): that initializes the XLA
    backend as a side effect, after which jax.distributed.initialize raises
    ("backends already initialized") and multi-host init can never activate.
    """
    try:
        from jax._src import distributed  # jax 0.9 internal, but stable enough

        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - internal layout changed
        return _initialized


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Bring up the jax.distributed control plane (idempotent).

    Returns True iff a multi-process runtime is active after the call.
    Priority: explicit args > env vars > TPU auto-detect > single-process
    no-op. Safe to call unconditionally from every entry point.

    Must run BEFORE anything touches the XLA backend (jax.devices(),
    jax.process_count(), any jit): backend queries are only made *after*
    the initialize attempt here.
    """
    global _initialized
    if _initialized or _distributed_client_active():
        _initialized = True
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _initialized = True
        elif _on_tpu_pod():
            # libtpu metadata discovery: no args needed on Cloud TPU pods
            jax.distributed.initialize()
            _initialized = True
    except RuntimeError as e:
        if coordinator_address:
            # A coordinator was explicitly configured: silently degrading to
            # process 0/1 would make every host run the full global batch and
            # write the same checkpoint dir. Fail loudly instead.
            raise RuntimeError(
                "jax.distributed.initialize failed although COORDINATOR_ADDRESS "
                "was configured — the XLA backend was probably initialized "
                "before bootstrap.initialize() (call it first)."
            ) from e
        # TPU auto-detect path on an already-initialized backend: tolerable
        # only for single-process dev runs/tests.
        logger.warning("jax.distributed.initialize skipped: %s", e)
    multi = jax.process_count() > 1
    if multi:
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    return multi


def _on_tpu_pod() -> bool:
    """Heuristic: a MULTI-worker Cloud-TPU pod where argless initialize works.

    Single-worker setups (including the axon tunnel, which exports
    TPU_WORKER_HOSTNAMES=localhost) must not trigger it.
    """
    if os.environ.get("MVPNET_TPU_AUTODETECT", "") == "0":
        return False
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return ("," in hosts) or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def is_primary() -> bool:
    """True on the process that should own logging / checkpoint / metrics."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def global_batch_to_local(global_batch: int) -> int:
    """Per-host batch slice; global batch must divide evenly across hosts."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes"
    )
    return global_batch // n


def make_global_array(mesh: Mesh, local_batch: np.ndarray, spec: P | None = None):
    """Assemble a globally-sharded jax.Array from this host's local shard.

    ``local_batch`` is this process's slice along axis 0; the global array is
    sharded over the mesh's data axis. Single-process fast path: plain
    device_put with the sharding.
    """
    spec = spec if spec is not None else P(DATA_AXIS)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)


def make_global_batch(mesh: Mesh, batch: dict, specs: dict | None = None) -> dict:
    """Multi-host analog of dist.mesh.shard_batch for a dict of arrays.

    ``specs`` (key -> PartitionSpec) overrides the default P(data) layout —
    space-sharded training feeds dist.train_sp.batch_specs here so view axes
    land sharded over the space axis.
    """
    ndata = mesh.shape[DATA_AXIS]
    out = {}
    for k, v in batch.items():
        if v.ndim >= 1 and (v.shape[0] * jax.process_count()) % ndata == 0:
            out[k] = make_global_array(mesh, v, spec=specs.get(k) if specs else None)
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out
