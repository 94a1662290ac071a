"""Config system: frozen dataclasses + YAML overlays + dotted CLI overrides.

TPU-native replacement for the reference's yacs CfgNode trees
(``mvpnet/config/{sem_seg_2d,mvpnet_3d}.py`` + ``configs/scannet/*.yaml``,
UNVERIFIED — see SURVEY.md §5 "Config/flag system"). Same capability surface:
per-task defaults, YAML overlay (``merge_from_file``), CLI dotted overrides
(``merge_from_list``), frozen after construction, serialized into the output
dir. Implemented with plain dataclasses so configs are hashable pytree-static
arguments to jitted functions.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Tuple

import yaml


# ---------------------------------------------------------------------------
# Leaf config nodes
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    """2D encoder-decoder (UNet over a from-scratch ResNet-34 encoder).

    Mirrors the capability of the reference ``UNetResNet34``
    (mvpnet/models/unet_resnet34.py, UNVERIFIED): seg logits head plus a
    full-resolution feature map consumed by the 3D fusion stage.
    """

    in_channels: int = 3
    num_classes: int = 20
    base_channels: int = 64
    # Channel widths of the 4 ResNet-34 stages.
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    # BasicBlock counts of the 4 ResNet-34 stages.
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 64)
    # Channels of the fusion feature map handed to the 3D net.
    feature_channels: int = 64
    norm: str = "batch"  # "batch" | "group"
    dtype: str = "bfloat16"
    # optional torchvision resnet34 checkpoint (.pth state_dict or .npz) to
    # import into the encoder (models/unet.load_torch_resnet34; SURVEY.md §7
    # "2D pretraining without ImageNet weights" weight-import hook)
    torch_weights: str = ""


@dataclass(frozen=True)
class AggregationConfig:
    """kNN multi-view feature aggregation (reference ``FeatureAggregation``,
    mvpnet/models/mvpnet_3d.py ~L? UNVERIFIED; SURVEY.md §2.2)."""

    k: int = 3
    mlp_channels: Tuple[int, ...] = (64, 64, 64)
    reduction: str = "max"  # "max" | "sum" | "mean"
    use_relative_xyz: bool = True


@dataclass(frozen=True)
class SetAbstractionConfig:
    npoint: int = 1024
    radius: float = 0.1
    nsample: int = 32
    mlp_channels: Tuple[int, ...] = (32, 32, 64)


@dataclass(frozen=True)
class PN2SSGConfig:
    """PointNet++ single-scale-grouping segmentation net (reference
    ``PN2SSG``, mvpnet/models/pn2ssg.py UNVERIFIED; semantics fixed by the
    PointNet++ paper — SURVEY.md §2.2)."""

    num_classes: int = 20
    in_channels: int = 64  # fused 2D feature channels (0 for xyz-only)
    sa: Tuple[SetAbstractionConfig, ...] = (
        SetAbstractionConfig(1024, 0.1, 32, (32, 32, 64)),
        SetAbstractionConfig(256, 0.2, 32, (64, 64, 128)),
        SetAbstractionConfig(64, 0.4, 32, (128, 128, 256)),
        SetAbstractionConfig(16, 0.8, 32, (256, 256, 512)),
    )
    fp_channels: Tuple[Tuple[int, ...], ...] = (
        (256, 256),
        (256, 128),
        (128, 128),
        (128, 128, 128),
    )
    head_channels: int = 128
    dropout: float = 0.5
    use_xyz: bool = True
    norm: str = "batch"
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class ModelConfig:
    name: str = "mvpnet_3d"  # "mvpnet_3d" | "sem_seg_2d" | "pn2ssg"
    unet: UNetConfig = field(default_factory=UNetConfig)
    aggregation: AggregationConfig = field(default_factory=AggregationConfig)
    pn2: PN2SSGConfig = field(default_factory=PN2SSGConfig)
    # Warm-start the 2D subnet from a 2D run's checkpoint (reference behavior:
    # train_3d loads the 2D seg checkpoint; SURVEY.md §3.1).
    pretrained_2d: str = ""
    freeze_2d: bool = False
    # Weight of the auxiliary per-view 2D seg loss in mvpnet_3d training
    # (reference exposes loss weights via cfg; SURVEY.md §2.2 registry row).
    aux_2d_loss_weight: float = 0.1


@dataclass(frozen=True)
class DataConfig:
    name: str = "synthetic"  # "scannet" | "synthetic"
    root: str = "data/scannet"
    # "chunks": 2D-3D chunk pipeline (train_3d); "frames": frame-level 2D
    # corpus with random frame sampling (train_2d; reference ScanNet2D,
    # SURVEY.md §2.2 "2D dataset" / §3.6)
    sampling: str = "chunks"
    num_points: int = 8192
    chunk_size: float = 1.5  # meters (x, y)
    chunk_stride: float = 0.5  # sliding-window stride at eval
    chunk_margin: float = 0.2  # extra margin when masking points into a chunk
    num_views_train: int = 3
    num_views_eval: int = 5
    image_height: int = 120
    image_width: int = 160
    num_classes: int = 20
    ignore_label: int = -100
    # Max candidate frames scored by greedy view selection.
    max_candidate_frames: int = 64
    # Augmentation (train): random z-rotation, flips, color jitter.
    augment: bool = True
    color_jitter: float = 0.4
    flip_prob: float = 0.5
    z_rot: bool = True
    # ship images as uint8 / depth as uint16 mm across the host->device
    # boundary and convert inside the jitted step (4x less H2D traffic)
    compact_transfer: bool = True
    # pack the whole batch into one byte buffer per transfer: one device_put
    # + one jitted unpack instead of a per-array RPC (data/pipeline.py)
    packed_transfer: bool = True
    # ship per-point RGB in chunk batches (xyz+RGB ablation models only)
    include_colors: bool = False
    # scenes kept resident by the lazy scene store (scannet datasets stream
    # per-scene npz files on demand; data/scannet.SceneStore)
    cache_scenes: int = 32
    # synthetic-corpus size (data.name=synthetic): train scene count (val
    # uses half) and objects per scene. The round-3 e2e run left 11/20
    # classes at 0.0 IoU mostly because 4 scenes x 6 random-class objects
    # cannot cover 18 object classes — scale these up for convergence runs
    # (tools/e2e_run.py).
    synthetic_scenes: int = 4
    synthetic_objects: int = 6
    # frame-mode sampling locality: frames drawn per scene visit (scene
    # picked proportional to its frame count, so the per-frame marginal
    # stays uniform); amortizes lazy scene loads K-fold (data/frames.py)
    frames_per_scene_visit: int = 8
    # host-side prefetch depth (double-buffered device_put)
    prefetch: int = 2
    num_workers: int = 8
    seed: int = 0


@dataclass(frozen=True)
class SolverConfig:
    """Optimizer/scheduler factory config (reference common/solver/build.py
    UNVERIFIED; SURVEY.md §2.2 "Solver")."""

    optimizer: str = "adam"  # "adam" | "sgd" | "adamw"
    base_lr: float = 1e-3
    weight_decay: float = 0.0
    momentum: float = 0.9
    scheduler: str = "step"  # "step" | "multistep" | "cosine" | "none"
    # StepLR: decay by gamma every step_size iterations.
    step_size: int = 10000
    milestones: Tuple[int, ...] = ()
    gamma: float = 0.5
    # LR floor, mirroring the reference's ClipLR capability [U].
    clip_lr: float = 1e-5
    warmup_steps: int = 0
    max_grad_norm: float = 0.0  # 0 disables clipping
    # run the optimizer update over ONE flattened parameter vector instead
    # of hundreds of small tensors (train/solver.flatten_update; exact for
    # these unmasked optimizers). Default OFF: the device-resident A/B
    # measured it a wash (update 4.9 -> 4.75 ms, step 106.5 -> 108.4 ms at
    # config-#2 shapes; runs/r4_opt_flat.json) — round 3's "28 ms marginal"
    # was per-call dispatch overhead, not device time. Kept because some
    # deployments (many more tensors, other optimizers) may differ.
    flatten_update: bool = False


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    max_steps: int = 30000
    log_every: int = 50
    val_every: int = 1000
    val_steps: int = 50
    ckpt_every: int = 1000
    ckpt_keep: int = 5
    seed: int = 0
    # donate params/opt-state buffers in the jitted step. Default OFF: on
    # the tunneled v5e, donation measured 45 ms/step SLOWER at config-#2
    # shapes (157.3 vs 111.8 ms, tools/step_gap.py — docs/PERF_NOTES.md
    # round 3); enable for memory-bound configs (32k-pt chunks, 64-view).
    donate: bool = False
    remat: bool = False  # jax.checkpoint the 2D net to trade FLOPs for HBM
    # gradient accumulation: split each batch into this many sequential
    # microbatches inside the jitted step (lax.scan), average grads, one
    # optimizer update. The config-#3 answer on this host: batch 32 at 32k
    # points exceeds the tunnel compile-helper's program ceiling as one
    # microbatch (B16+ crashes it — runs/r4_config_shapes.json), so 32 runs
    # as 4 x B8. Loss/metrics are microbatch means (exact vs the monolithic
    # batch when per-microbatch valid counts are equal); BN batch stats see
    # microbatch-sized batches.
    grad_accum: int = 1
    # capture a jax.profiler trace for steps [profile_start, profile_stop)
    # into <output_dir>/profile; 0/0 disables
    profile_start: int = 0
    profile_stop: int = 0


@dataclass(frozen=True)
class EvalConfig:
    """Whole-scene inference (reference test_3d.py equivalent; SURVEY.md §3.2).

    ``sharded`` switches to the space-sharded mode (the build's SP analog,
    SURVEY.md §2.3 SP row / §5 long-context row): one view set is selected for
    the whole scene and sharded over the mesh ``space`` axis together with the
    chunk windows; fusion kNN runs as a ring ``ppermute`` exchange so every
    chunk point sees every shard's pixel cloud (eval/sharded_scene.py).
    """

    batch_size: int = 4  # chunk minibatch in the single-device mode
    sharded: bool = False
    # single-device scene-view-set mode: one view set per scene, 2D net run
    # once, pixel cloud knn_prepare()'d once, chunks query the prepared
    # cloud (eval/scene_fused.py — the sharded estimator on one chip; the
    # config-#4 64-view whole-scene consumer)
    fused: bool = False
    # views selected per scene in sharded mode (padded up to a multiple of
    # the space-axis size; each shard runs the 2D net over its local views)
    scene_views: int = 12
    # chunk windows processed per shard per fusion pass
    chunks_per_shard: int = 4


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data = batch/chunk sharding, space = spatial
    sharding of whole-scene point sets + their view frustums (the build's
    sequence-parallel analog; SURVEY.md §2.3)."""

    data: int = -1  # -1: use all devices on the data axis
    space: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    output_dir: str = "outputs/default"
    # ops implementation: "auto" picks pallas on TPU, jnp reference elsewhere
    ops_impl: str = "auto"


# ---------------------------------------------------------------------------
# YAML / CLI merging
# ---------------------------------------------------------------------------


def _build(cls: type, value: Any) -> Any:
    """Recursively construct a (possibly nested) dataclass from plain data."""
    if is_dataclass(cls) and isinstance(value, dict):
        kwargs = {}
        field_map = {f.name: f for f in fields(cls)}
        for key, sub in value.items():
            if key not in field_map:
                raise KeyError(f"Unknown config key '{key}' for {cls.__name__}")
            f = field_map[key]
            kwargs[key] = _coerce(f.type, sub, cls, f)
        return cls(**kwargs)
    return value


def _coerce(ftype: Any, value: Any, owner: type, f: dataclasses.Field) -> Any:
    default = f.default if f.default is not dataclasses.MISSING else (
        f.default_factory() if f.default_factory is not dataclasses.MISSING else None
    )
    if is_dataclass(default) and isinstance(value, dict):
        return _merge_dataclass(default, value)
    if isinstance(default, tuple) and isinstance(value, (list, tuple)):
        if default and is_dataclass(default[0]):
            elem_cls = type(default[0])
            return tuple(
                _build(elem_cls, v) if isinstance(v, dict) else v for v in value
            )
        return tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in value)
    return value


def _merge_dataclass(obj: Any, overrides: dict) -> Any:
    """Return a copy of dataclass ``obj`` with ``overrides`` applied."""
    field_map = {f.name: f for f in fields(obj)}
    kwargs = {}
    for key, value in overrides.items():
        if key not in field_map:
            raise KeyError(
                f"Unknown config key '{key}' for {type(obj).__name__}"
            )
        current = getattr(obj, key)
        if is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _merge_dataclass(current, value)
        else:
            kwargs[key] = _coerce(field_map[key].type, value, type(obj), field_map[key])
    return dataclasses.replace(obj, **kwargs)


def load_config(yaml_path: str | None = None, overrides: list[str] | None = None) -> Config:
    """Build a Config: defaults ← YAML file ← dotted CLI overrides.

    ``overrides`` are ``key.path=value`` strings, e.g.
    ``train.batch_size=16 model.pn2.dropout=0.3`` (the reference's
    ``merge_from_list`` equivalent).
    """
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as fh:
            data = yaml.safe_load(fh) or {}
        cfg = _merge_dataclass(cfg, data)
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"Override must look like key.path=value, got {item!r}")
        path, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        tree: dict = {}
        node = tree
        parts = path.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
        cfg = _merge_dataclass(cfg, tree)
    return cfg


def to_dict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, tuple):
        return [to_dict(v) for v in cfg]
    return cfg


def save_config(cfg: Config, path: str) -> None:
    # second train() in one process: setup_logger short-circuits (handlers
    # already installed) and never creates the new output dir — make it here
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as fh:
        yaml.safe_dump(to_dict(cfg), fh, sort_keys=False)


def config_json(cfg: Config) -> str:
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True)
