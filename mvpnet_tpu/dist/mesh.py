"""Device mesh + sharding helpers.

The reference has NO distributed runtime (single process, single GPU —
SURVEY.md §2.3/§2.4); this layer is the TPU-native capability the north star
mandates: a (data, space) mesh where
  * ``data``  shards batches of chunks (DP), and
  * ``space`` shards whole-scene point sets + their co-located view frustums
    for distributed fusion (the sequence-parallel analog, §2.3 SP row).
All cross-chip traffic is GSPMD collectives emitted from NamedSharding /
shard_map annotations — no hand-written comm backend.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvpnet_tpu.config import MeshConfig

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    space = cfg.space if cfg else 1
    data = cfg.data if cfg else -1
    if data == -1:
        assert n % space == 0, f"{n} devices not divisible by space={space}"
        data = n // space
    assert data * space == n, (data, space, n)
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Chunks (batch dim) sharded over data; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put a host batch with the leading dim sharded over data.

    Arrays without a shardable leading dim (e.g. per-batch scalars) are
    replicated.
    """
    ndata = mesh.shape[DATA_AXIS]
    out = {}
    for k, v in batch.items():
        if v.ndim >= 1 and v.shape[0] % ndata == 0:
            out[k] = jax.device_put(v, NamedSharding(mesh, P(DATA_AXIS)))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out
