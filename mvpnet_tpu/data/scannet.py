"""ScanNet v2 scene loading (preprocessed npz layout).

Capability-equivalent of the reference's per-scene pickle caches + meta
split files (mvpnet/data/scannet_2d3d.py + preprocess scripts, UNVERIFIED;
SURVEY.md §2.2 "2D-3D chunk dataset", "Preprocessing"). The on-disk layout
produced by ``mvpnet_tpu/data/preprocess.py``:

  <root>/
    meta/scannetv2_train.txt         one scene id per line
    meta/scannetv2_val.txt
    meta/scannetv2_test.txt
    scenes/<scene_id>.npz            points, colors, labels
    frames/<scene_id>.npz            depth, rgb, label_2d, poses, intrinsics

Arrays use the same field names/shapes as ``synthetic.Scene`` so the chunk
pipeline is source-agnostic. Frames npz may hold uint8 rgb / uint16 depth
(mm) to keep disk small; they are converted on load.
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from mvpnet_tpu.data.synthetic import Scene


def read_split(root: str, split: str) -> list[str]:
    path = os.path.join(root, "meta", f"scannetv2_{split}.txt")
    with open(path) as fh:
        return [line.strip() for line in fh if line.strip()]


def _to_float_rgb(rgb: np.ndarray) -> np.ndarray:
    if rgb.dtype == np.uint8:
        return rgb.astype(np.float32) / 255.0
    return rgb.astype(np.float32)


def _to_meters(depth: np.ndarray, depth_scale: float) -> np.ndarray:
    if depth.dtype == np.uint16:
        return depth.astype(np.float32) / depth_scale
    return depth.astype(np.float32)


def load_scene(root: str, scene_id: str, *, with_frames: bool = True) -> Scene:
    scene_npz = np.load(os.path.join(root, "scenes", f"{scene_id}.npz"))
    points = scene_npz["points"].astype(np.float32)
    colors = _to_float_rgb(scene_npz["colors"])
    labels = scene_npz["labels"].astype(np.int32)

    if with_frames:
        f = np.load(os.path.join(root, "frames", f"{scene_id}.npz"))
        depth_scale = float(f["depth_scale"]) if "depth_scale" in f else 1000.0
        depth = _to_meters(f["depth"], depth_scale)
        rgb = _to_float_rgb(f["rgb"])
        label_2d = (
            f["label_2d"].astype(np.int32)
            if "label_2d" in f
            else np.full(depth.shape, -100, np.int32)
        )
        poses = f["poses"].astype(np.float32)
        intrinsics = f["intrinsics"].astype(np.float32)
    else:
        depth = np.zeros((0, 1, 1), np.float32)
        rgb = np.zeros((0, 1, 1, 3), np.float32)
        label_2d = np.zeros((0, 1, 1), np.int32)
        poses = np.zeros((0, 4, 4), np.float32)
        intrinsics = np.eye(3, dtype=np.float32)

    return Scene(
        name=scene_id,
        points=points,
        colors=colors,
        labels=labels,
        depth=depth,
        rgb=rgb,
        label_2d=label_2d,
        poses=poses,
        intrinsics=intrinsics,
    )


@lru_cache(maxsize=4)
def _cached_split(root: str, split: str) -> tuple[str, ...]:
    return tuple(read_split(root, split))


class SceneStore:
    """Lazy, memory-bounded scene collection.

    Real ScanNet is ~1,200 train scenes x hundreds of frames — far beyond
    host RAM if loaded eagerly (round-1 VERDICT missing #5). The reference
    streams per-scene pickles on demand (SURVEY.md §2.2, §3.4); this is the
    equivalent: each ``store[i]`` loads the scene's npz pair on first access
    and an LRU keeps at most ``capacity`` scenes resident (the attached
    ``extra`` caches — e.g. the native grid index — are evicted with them).

    Thread-safe for the prefetch worker pool: the LRU is lock-protected and
    concurrent first-loads of the same scene are de-duplicated with
    per-scene events.
    """

    def __init__(self, root: str, ids, *, capacity: int = 32):
        import collections
        import threading

        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.root = root
        self.ids = list(ids)
        self.capacity = capacity
        self._cache: "collections.OrderedDict[int, Scene]" = collections.OrderedDict()
        self._lock = threading.Lock()
        self._loading: dict[int, "threading.Event"] = {}
        self.loads = 0  # total disk loads (cache misses), for tests/metrics

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, i: int) -> Scene:
        import threading

        i = int(i)
        while True:
            with self._lock:
                if i in self._cache:
                    self._cache.move_to_end(i)
                    return self._cache[i]
                ev = self._loading.get(i)
                if ev is None:
                    ev = threading.Event()
                    self._loading[i] = ev
                    break  # this thread loads
            ev.wait()  # another thread is loading scene i
        try:
            scene = load_scene(self.root, self.ids[i])
            with self._lock:
                self.loads += 1
                self._cache[i] = scene
                while len(self._cache) > self.capacity:
                    self._cache.popitem(last=False)
            return scene
        finally:
            with self._lock:
                self._loading.pop(i, None)
            ev.set()

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @property
    def resident(self) -> int:
        with self._lock:
            return len(self._cache)


def load_scenes(
    root: str,
    split: str,
    *,
    limit: int | None = None,
    lazy: bool = False,
    capacity: int = 32,
):
    """Scenes of a split: an eager list, or a lazy ``SceneStore``."""
    ids = _cached_split(root, split)
    if limit:
        ids = ids[:limit]
    if lazy:
        return SceneStore(root, ids, capacity=capacity)
    return [load_scene(root, sid) for sid in ids]


def frame_count(root: str, scene_id: str) -> int:
    """Frames in a scene, read from the tiny (F,4,4) poses array only — no
    depth/rgb decompression (used for lazy frame indexing, data/frames.py)."""
    with np.load(os.path.join(root, "frames", f"{scene_id}.npz")) as f:
        return int(f["poses"].shape[0])


def available(root: str) -> bool:
    return os.path.isdir(os.path.join(root, "scenes"))
