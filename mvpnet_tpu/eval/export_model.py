"""Serialized inference artifacts (jax.export / StableHLO).

Deployment story the reference lacks entirely (SURVEY.md §1: "no serving
layer"): the jitted chunk-inference forward — parameters baked in — is
exported to a self-contained, versioned StableHLO artifact that a serving
process can load WITHOUT the model-building code (and, via jax.export's
compatibility guarantees, without this exact jax version).

Artifact layout (one directory):
  forward.jaxexp   serialized jax.export blob (params are constants)
  meta.json        shapes, dtypes, config echo, class names
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx
from jax import export as jexport

from mvpnet_tpu.config import Config, to_dict
from mvpnet_tpu.data.meta import CLASS_NAMES
from mvpnet_tpu.train.step import prepare_batch

# the raw eval chunk batch (host wire layout, pre-lift; see
# data/pipeline.make_chunk_sample and train/step.prepare_batch)
_BATCH_KEYS = ("points", "images", "depth", "poses", "intrinsics")


def _batch_spec(cfg: Config, batch_size: int):
    B = batch_size
    N = cfg.data.num_points
    V = cfg.data.num_views_eval
    H, W = cfg.data.image_height, cfg.data.image_width
    return {
        "points": jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        "images": jax.ShapeDtypeStruct((B, V, H, W, 3), jnp.float32),
        "depth": jax.ShapeDtypeStruct((B, V, H, W), jnp.float32),
        "poses": jax.ShapeDtypeStruct((B, V, 4, 4), jnp.float32),
        "intrinsics": jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
    }


def export_inference(model, cfg: Config, out_dir: str, *, batch_size: int | None = None) -> str:
    """Export the eval forward (logits over chunk points) with params baked
    in. Returns the artifact directory."""
    model.eval()
    graphdef, state = nnx.split(model)
    B = batch_size or cfg.eval.batch_size

    def forward(batch):
        m = nnx.merge(graphdef, state)
        mb = prepare_batch(cfg, batch, training=False)
        logits_3d, _ = m(mb)
        return logits_3d

    spec = _batch_spec(cfg, B)
    exp = jexport.export(jax.jit(forward))(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "forward.jaxexp"), "wb") as fh:
        fh.write(exp.serialize())
    meta = {
        "batch_keys": list(_BATCH_KEYS),
        "input_spec": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in spec.items()
        },
        "output": {
            "shape": [B, cfg.data.num_points, cfg.data.num_classes],
            "dtype": "float32",
            "semantics": "per-point class logits",
        },
        "platforms": list(exp.platforms),
        "class_names": list(CLASS_NAMES[: cfg.data.num_classes]),
        "config": to_dict(cfg),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return out_dir


class LoadedModel:
    """A deserialized inference artifact: ``__call__(batch) -> logits``."""

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, "forward.jaxexp"), "rb") as fh:
            self._exp = jexport.deserialize(fh.read())
        with open(os.path.join(art_dir, "meta.json")) as fh:
            self.meta = json.load(fh)

    def __call__(self, batch: dict):
        spec = self.meta["input_spec"]
        arrs = {
            k: jnp.asarray(batch[k], dtype=spec[k]["dtype"]) for k in spec
        }
        return self._exp.call(arrs)


def load_inference(art_dir: str) -> LoadedModel:
    return LoadedModel(art_dir)
