"""Pipeline-level tests (SURVEY.md §4 implication 3): synthetic mini-scene
through dataset -> device prep -> model -> loss on the CPU backend."""
import os
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from mvpnet_tpu.config import Config, DataConfig
from mvpnet_tpu.core.camera import unproject_views
from mvpnet_tpu.data.pipeline import ChunkDataset, PrefetchIterator, build_dataset, make_chunk_sample
from mvpnet_tpu.data.synthetic import make_scene
from mvpnet_tpu.data.view_select import greedy_select_views, point_frame_coverage
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.step import make_eval_step, make_train_step, prepare_batch
from tests.test_models import tiny_config


def small_data_cfg(**kw):
    base = dict(
        name="synthetic",
        num_points=256,
        num_views_train=2,
        num_views_eval=3,
        image_height=24,
        image_width=32,
        num_classes=5,
        max_candidate_frames=8,
    )
    base.update(kw)
    return DataConfig(**base)


@pytest.fixture(scope="module")
def scene():
    return make_scene(0, num_points=20000, num_frames=6, height=24, width=32, num_classes=5)


def test_scene_generator(scene):
    assert scene.points.shape[1] == 3
    assert scene.depth.shape == (6, 24, 32)
    assert scene.labels.min() >= 0 and scene.labels.max() < 5
    # some pixels valid, some holes
    frac_valid = (scene.depth > 0).mean()
    assert 0.2 < frac_valid <= 1.0


def test_render_unproject_roundtrip(scene):
    """Unprojecting a rendered depth map must land on scene surfaces."""
    xyz, valid = unproject_views(
        jnp.asarray(scene.depth[None]),
        jnp.asarray(scene.intrinsics),
        jnp.asarray(scene.poses[None]),
    )
    xyz = np.asarray(xyz)[0]
    valid = np.asarray(valid)[0]
    pix = xyz[valid]
    # every valid unprojected pixel should be close to some scene point
    from scipy.spatial import cKDTree

    tree = cKDTree(scene.points)
    d, _ = tree.query(pix[:: max(len(pix) // 500, 1)], k=1)
    assert np.median(d) < 0.05, np.median(d)


def test_view_selection_improves_coverage(scene):
    pts = scene.points[:: len(scene.points) // 400]
    cover = point_frame_coverage(pts, scene.depth, scene.poses, scene.intrinsics)
    chosen, covered = greedy_select_views(cover, 3)
    assert len(set(chosen.tolist())) == 3  # distinct frames
    # greedy coverage >= best single frame's coverage
    assert covered.sum() >= cover.sum(axis=1).max()


def test_chunk_sample_shapes(scene):
    cfg = small_data_cfg()
    rng = np.random.default_rng(0)
    s = make_chunk_sample(scene, cfg, rng=rng)
    assert s["points"].shape == (256, 3)
    assert s["seg_label"].shape == (256,)
    assert s["images"].shape == (2, 24, 32, 3)
    assert s["depth"].shape == (2, 24, 32)
    assert s["poses"].shape == (2, 4, 4)
    # chunk points stay inside the box (wire format: int16 millimeters)
    assert s["points"].dtype == np.int16
    pts = s["points"].astype(np.float32) / 1000.0
    span = pts[:, :2].max(0) - pts[:, :2].min(0)
    assert np.all(span <= cfg.chunk_size + 2 * cfg.chunk_margin + 1e-3)


def test_dataset_iteration_and_prefetch(scene):
    cfg = small_data_cfg()
    ds = ChunkDataset([scene], cfg, batch_size=2, training=True, seed=0)
    it = PrefetchIterator(ds, prefetch=2, num_threads=2)
    b1 = next(it)
    b2 = next(it)
    assert b1["points"].shape == (2, 256, 3)
    assert isinstance(b1["points"], jax.Array)
    # batches differ (random chunks)
    assert not np.allclose(np.asarray(b1["points"]), np.asarray(b2["points"]))
    it.close()


def test_prefetch_propagates_worker_errors():
    class Boom:
        def worker_iter(self, worker_id):
            def gen():
                raise ValueError("synthetic failure")
                yield  # pragma: no cover

            return gen()

    it = PrefetchIterator(Boom(), prefetch=1, num_threads=2)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(it)
    it.close()


def test_prefetch_workers_run_concurrently():
    """N workers with per-worker streams must overlap batch assembly (the
    round-1 pipeline serialized every worker on one locked iterator)."""
    import time

    class Slow:
        def worker_iter(self, worker_id):
            def gen():
                while True:
                    time.sleep(0.05)
                    yield {"x": np.zeros(1, np.float32)}

            return gen()

    it = PrefetchIterator(Slow(), prefetch=8, num_threads=4)
    t0 = time.perf_counter()
    for _ in range(8):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    # serial: 8 * 0.05 = 0.4s; 4-way parallel: ~0.1s. Allow generous slack.
    assert dt < 0.3, f"prefetch appears serialized ({dt:.3f}s for 8 batches)"


def test_prefetch_close_joins_threads(scene):
    cfg = small_data_cfg()
    ds = ChunkDataset([scene], cfg, batch_size=1, training=True, seed=0)
    it = PrefetchIterator(ds, prefetch=1, num_threads=2)
    next(it)
    it.close()
    assert all(not t.is_alive() for t in it._threads)


def _full_cfg():
    cfg = tiny_config()  # 5-class tiny model
    return dataclasses.replace(cfg, data=small_data_cfg())


def test_prepare_batch_lift_and_augment(scene):
    cfg = _full_cfg()
    ds = ChunkDataset([scene], cfg.data, batch_size=2, training=True, seed=0)
    batch = jax.device_put(next(iter(ds)))
    out = prepare_batch(cfg, batch, training=True, rng_key=jax.random.key(0))
    assert out["image_xyz"].shape == (2, 2, 24, 32, 3)
    assert out["seg_label_2d"].shape == (2, 2, 24, 32)
    # invalid pixels must carry the far sentinel
    valid = np.asarray(out["image_valid"])
    xyz = np.asarray(out["image_xyz"])
    if (~valid).any():
        assert np.abs(xyz[~valid]).max() > 1e5
    # and their 2D labels must be ignored
    lab2d = np.asarray(out["seg_label_2d"])
    assert np.all(lab2d[~valid] == cfg.data.ignore_label)


def test_train_step_end_to_end(scene):
    import optax
    from mvpnet_tpu.train.solver import build_optimizer

    cfg = _full_cfg()
    model, loss_fn, metric_fn = build_model(cfg, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, build_optimizer(cfg.solver), wrt=nnx.Param)
    train_step = make_train_step(cfg, loss_fn, metric_fn)
    eval_step = make_eval_step(cfg, loss_fn, metric_fn)

    ds = ChunkDataset([scene], cfg.data, batch_size=2, training=True, seed=0)
    it = iter(ds)
    key = jax.random.key(0)
    losses = []
    for i in range(3):
        batch = jax.device_put(next(it))
        key, sub = jax.random.split(key)
        m = train_step(model, optimizer, batch, sub)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)

    model.eval()
    ev = eval_step(model, jax.device_put(next(it)))
    assert np.isfinite(float(ev["loss"]))
    assert ev["confusion"].shape == (5, 5)


def test_build_dataset_factory():
    cfg = small_data_cfg()
    ds = build_dataset(cfg, batch_size=1, training=True, seed=0)
    b = next(iter(ds))
    assert b["points"].shape[0] == 1


def test_native_grid_index_matches_numpy(rng):
    from mvpnet_tpu.data.native import GridIndex

    pts = rng.uniform(0, 8, (50000, 3)).astype(np.float32)
    gi = GridIndex(pts, cell=0.6)
    for center, half in [((4.0, 4.0), 0.95), ((0.2, 7.8), 1.2), ((9.5, 9.5), 0.5)]:
        got = set(gi.query_box(center, half).tolist())
        near = np.abs(pts[:, :2] - np.asarray(center))
        want = set(np.nonzero((near[:, 0] <= half) & (near[:, 1] <= half))[0].tolist())
        assert got == want


def test_native_greedy_matches_python(rng):
    from mvpnet_tpu.data.native import greedy_cover_native
    from mvpnet_tpu.data.view_select import greedy_select_views

    cov = rng.random((16, 300)) < 0.25
    native = greedy_cover_native(cov, 4)
    if native is None:
        pytest.skip("native lib unavailable")
    # python fallback path (bypasses the native shortcut via F < num_views)
    remaining = np.ones(cov.shape[1], bool)
    chosen = []
    for _ in range(4):
        gains = cov[:, remaining].sum(axis=1)
        if chosen:
            gains[np.asarray(chosen)] = -1
        best = int(np.argmax(gains))
        chosen.append(best)
        remaining &= ~cov[best]
    np.testing.assert_array_equal(native, chosen)


def _write_fake_scan(raw: str, scene_id: str, rng):
    """Synthesize a raw ScanNet scan layout: binary PLY + frames on disk."""
    import struct
    from PIL import Image

    scan = os.path.join(raw, "scans", scene_id)
    for d in ("color", "depth", "pose", "intrinsic", "label"):
        os.makedirs(os.path.join(scan, d), exist_ok=True)

    n = 500
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    nyu = rng.choice([1, 2, 5, 39, 0], n).astype(np.uint16)  # nyu40 ids

    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        + f"element vertex {n}\n".encode()
        + b"property float x\nproperty float y\nproperty float z\n"
        + b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
        + b"property ushort label\nend_header\n"
    )
    with open(os.path.join(scan, f"{scene_id}_vh_clean_2.labels.ply"), "wb") as fh:
        fh.write(header)
        for i in range(n):
            fh.write(struct.pack("<fffBBBH", *xyz[i], *rgb[i], nyu[i]))

    H, W = 48, 64
    for fid in range(3):
        Image.fromarray(
            rng.integers(0, 255, (H * 2, W * 2, 3)).astype(np.uint8)
        ).save(os.path.join(scan, "color", f"{fid}.jpg"))
        Image.fromarray(
            (rng.uniform(500, 3000, (H * 2, W * 2))).astype(np.uint16)
        ).save(os.path.join(scan, "depth", f"{fid}.png"))
        Image.fromarray(
            rng.choice([0, 1, 2, 5], (H * 2, W * 2)).astype(np.uint8)
        ).save(os.path.join(scan, "label", f"{fid}.png"))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.uniform(-1, 1, 3)
        np.savetxt(os.path.join(scan, "pose", f"{fid}.txt"), pose)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 60.0
    intr[0, 2], intr[1, 2] = W, H
    np.savetxt(os.path.join(scan, "intrinsic", "intrinsic_depth.txt"), intr)
    return xyz, nyu


def test_write_split_lists(tmp_path):
    """Official split lists are copied verbatim; otherwise a deterministic
    fallback split is written so data/scannet.read_split always resolves
    (the runbook previously broke at train time: preprocess created meta/
    but never materialized the lists)."""
    from mvpnet_tpu.data.preprocess import write_split_lists
    from mvpnet_tpu.data.scannet import read_split

    scans = [f"scene{i:04d}_00" for i in range(20)]

    # fallback path: no official lists anywhere in the raw tree
    raw, out = str(tmp_path / "raw1"), str(tmp_path / "out1")
    os.makedirs(os.path.join(out, "meta"))
    os.makedirs(raw)
    write_split_lists(raw, out, scans)
    tr, va = read_split(out, "train"), read_split(out, "val")
    assert set(tr) | set(va) == set(scans) and not set(tr) & set(va)
    assert va == ["scene0009_00", "scene0019_00"]  # deterministic %10==9

    # official lists present: copied verbatim, fallback untouched
    raw, out = str(tmp_path / "raw2"), str(tmp_path / "out2")
    os.makedirs(os.path.join(raw, "Tasks", "Benchmark"))
    os.makedirs(os.path.join(out, "meta"))
    for split, ids in (("train", scans[:15]), ("val", scans[15:])):
        with open(
            os.path.join(raw, "Tasks", "Benchmark", f"scannetv2_{split}.txt"), "w"
        ) as fh:
            fh.write("\n".join(ids) + "\n")
    write_split_lists(raw, out, scans)
    assert read_split(out, "train") == scans[:15]
    assert read_split(out, "val") == scans[15:]

    # only ONE official list present: the fallback for the missing split
    # must exclude every scene claimed by the copied list (no train/val leak)
    raw, out = str(tmp_path / "raw3"), str(tmp_path / "out3")
    os.makedirs(os.path.join(raw, "Tasks", "Benchmark"))
    os.makedirs(os.path.join(out, "meta"))
    official_val = scans[15:]
    with open(
        os.path.join(raw, "Tasks", "Benchmark", "scannetv2_val.txt"), "w"
    ) as fh:
        fh.write("\n".join(official_val) + "\n")
    write_split_lists(raw, out, scans)
    tr, va = read_split(out, "train"), read_split(out, "val")
    assert va == official_val  # copied verbatim
    assert not set(tr) & set(va)  # the leak this guards against
    assert set(tr) == set(scans[:15])  # everything the official list left


def test_preprocess_roundtrip(tmp_path, rng):
    """Raw scan layout -> preprocess npz -> load_scenes -> chunk batch."""
    from mvpnet_tpu.data.meta import nyu40_to_train
    from mvpnet_tpu.data.preprocess import preprocess_scene
    from mvpnet_tpu.data.scannet import load_scenes

    raw, out = str(tmp_path / "raw"), str(tmp_path / "out")
    xyz, nyu = _write_fake_scan(raw, "scene0000_00", rng)
    table = nyu40_to_train()
    preprocess_scene(
        raw, out, "scene0000_00", table, None, height=24, width=32
    )
    os.makedirs(os.path.join(out, "meta"), exist_ok=True)
    with open(os.path.join(out, "meta", "scannetv2_train.txt"), "w") as fh:
        fh.write("scene0000_00\n")

    scenes = load_scenes(out, "train")
    assert len(scenes) == 1
    s = scenes[0]
    np.testing.assert_allclose(s.points, xyz, atol=1e-6)
    # labels mapped nyu40 -> train ids (0 and unmapped ids -> ignore)
    np.testing.assert_array_equal(s.labels, table[nyu])
    assert s.depth.shape == (3, 24, 32)
    assert s.rgb.shape == (3, 24, 32, 3)
    assert s.rgb.max() <= 1.0 and s.depth.max() < 4.0  # meters, [0,1] rgb
    assert s.label_2d.shape == (3, 24, 32)
    assert set(np.unique(s.label_2d)) <= {-100, 0, 1, 4}  # nyu 1,2,5 -> 0,1,4

    cfg = DataConfig(
        num_points=128,
        num_views_train=2,
        image_height=24,
        image_width=32,
        max_candidate_frames=3,
    )
    ds = ChunkDataset([s], cfg, batch_size=2, training=True, seed=0)
    batch = next(iter(ds))
    assert batch["points"].shape == (2, 128, 3)
    assert batch["images"].shape == (2, 2, 24, 32, 3)
    assert np.isfinite(batch["depth"]).all()


# ---------------------------------------------------------------------------
# Frame-level 2D dataset (reference ScanNet2D; SURVEY.md §2.2, §3.6)
# ---------------------------------------------------------------------------


def test_frame_dataset_samples_full_corpus(scene):
    from mvpnet_tpu.data.frames import FrameDataset

    cfg = small_data_cfg()
    ds = FrameDataset([scene], cfg, batch_size=4, training=True, seed=0)
    assert len(ds.index) == len(scene.depth)
    batch = next(iter(ds))
    assert batch["images"].shape == (4, 24, 32, 3)
    assert batch["images"].dtype == np.uint8  # compact transfer
    assert batch["seg_label_2d"].shape == (4, 24, 32)
    # random sampling must reach every frame of the corpus
    seen = set()
    rng = np.random.default_rng(0)
    for _ in range(200):
        s = ds.sample(rng)
        seen.add(s["seg_label_2d"].tobytes())
    assert len(seen) == len(scene.depth)


def test_frame_dataset_batches_mix_scenes():
    """With frames_per_scene_visit >= batch_size, batches must STILL mix
    several scenes (shuffle buffer over concurrent scene visits — advisor
    round-3 medium #1: consecutive-visit batches were single-scene, a
    shuffle-quality/BatchNorm regression vs the reference's uniform frame
    sampling)."""
    from mvpnet_tpu.data.frames import FrameDataset
    from mvpnet_tpu.data.synthetic import make_scene

    scenes = [
        make_scene(i, num_points=2000, num_frames=6, height=24, width=32)
        for i in range(4)
    ]
    cfg = small_data_cfg(frames_per_scene_visit=8)
    ds = FrameDataset(scenes, cfg, batch_size=8, training=True, seed=0)
    # map each frame image back to its scene via exact byte identity
    frame_to_scene = {}
    for si, s in enumerate(scenes):
        for fi in range(len(s.depth)):
            img = np.clip(s.rgb[fi] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            frame_to_scene[img.tobytes()] = si
    it = iter(ds)
    multi = 0
    for _ in range(10):
        batch = next(it)
        batch_scenes = {
            frame_to_scene[batch["images"][i].tobytes()]
            for i in range(batch["images"].shape[0])
        }
        if len(batch_scenes) > 1:
            multi += 1
    assert multi >= 8, f"only {multi}/10 batches mixed scenes"


def test_frame_dataset_iter_epoch_covers_every_frame(scene):
    from mvpnet_tpu.data.frames import FrameDataset

    cfg = small_data_cfg()
    ds = FrameDataset([scene], cfg, batch_size=4, training=False)
    total = 0
    labels = []
    for batch in ds.iter_epoch():
        n = batch["n_real"]
        total += n
        labels.append(batch["seg_label_2d"][:n])
    assert total == len(scene.depth)
    np.testing.assert_array_equal(
        np.concatenate(labels), scene.label_2d.astype(np.int32)
    )


def test_frame_mode_prepare_batch_augments_consistently(scene):
    """Frame batches route through prepare_frame_batch: dequantized, flip
    applied to image AND label together, labels NOT depth-masked."""
    from mvpnet_tpu.data.frames import FrameDataset

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, data=small_data_cfg())
    ds = FrameDataset([scene], cfg.data, batch_size=8, training=True, seed=0)
    batch = jax.device_put(next(iter(ds)))
    out = prepare_batch(cfg, batch, training=True, rng_key=jax.random.key(3))
    assert out["images"].shape == (8, 1, 24, 32, 3)
    assert out["images"].dtype == jnp.float32
    assert out["seg_label_2d"].shape == (8, 1, 24, 32)
    # labels keep every labeled pixel (no depth-valid masking in frame mode)
    raw = np.asarray(batch["seg_label_2d"])
    got = np.asarray(out["seg_label_2d"][:, 0])
    for i in range(8):
        unflipped = (got[i] == raw[i]).all()
        flipped = (got[i] == raw[i][:, ::-1]).all()
        assert unflipped or flipped
    # eval mode: untouched
    out_eval = prepare_batch(cfg, batch, training=False)
    np.testing.assert_array_equal(np.asarray(out_eval["seg_label_2d"][:, 0]), raw)


@pytest.mark.slow
def test_train_2d_on_frames_smoke(tmp_path, scene):
    """sem_seg_2d trains end-to-end through the frame pipeline."""
    from mvpnet_tpu.train.loop import train

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, name="sem_seg_2d"),
        data=dataclasses.replace(
            small_data_cfg(), sampling="frames", num_workers=2
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=4,
            max_steps=2,
            log_every=1,
            val_every=2,
            val_steps=1,
            ckpt_every=2,
            donate=False,
        ),
        output_dir=str(tmp_path / "run2d"),
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    model, metrics = train(cfg)
    assert np.isfinite(metrics["loss"])


# ---------------------------------------------------------------------------
# Lazy scene store (reference streams per-scene pickles; SURVEY.md §3.4)
# ---------------------------------------------------------------------------


def _write_scannet_layout(root, ids, template):
    """Write synthetic scenes into the preprocessed on-disk layout."""
    os.makedirs(os.path.join(root, "meta"), exist_ok=True)
    os.makedirs(os.path.join(root, "scenes"), exist_ok=True)
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    with open(os.path.join(root, "meta", "scannetv2_train.txt"), "w") as fh:
        fh.write("\n".join(ids) + "\n")
    for sid in ids:
        np.savez_compressed(
            os.path.join(root, "scenes", f"{sid}.npz"),
            points=template.points,
            colors=np.clip(template.colors * 255, 0, 255).astype(np.uint8),
            labels=template.labels.astype(np.int32),
        )
        np.savez_compressed(
            os.path.join(root, "frames", f"{sid}.npz"),
            depth=np.clip(template.depth * 1000, 0, 65535).astype(np.uint16),
            rgb=np.clip(template.rgb * 255, 0, 255).astype(np.uint8),
            label_2d=template.label_2d.astype(np.int16),
            poses=template.poses,
            intrinsics=template.intrinsics,
            depth_scale=np.float32(1000.0),
        )


def test_scene_store_lazy_lru(tmp_path):
    """50-scene corpus streams through a capacity-3 store: at most 3 scenes
    ever resident, loads/evictions happen, threaded prefetch stays correct."""
    from mvpnet_tpu.data.frames import FrameDataset
    from mvpnet_tpu.data.scannet import frame_count, load_scenes

    template = make_scene(9, num_points=3000, num_frames=3, height=12, width=16, num_classes=5)
    root = str(tmp_path / "scannet")
    ids = [f"scene{i:04d}_00" for i in range(50)]
    _write_scannet_layout(root, ids, template)

    store = load_scenes(root, "train", lazy=True, capacity=3)
    assert len(store) == 50
    assert store.resident == 0  # nothing loaded yet
    assert frame_count(root, ids[0]) == 3

    cfg = small_data_cfg(num_points=64, max_candidate_frames=3)
    ds = ChunkDataset(store, cfg, batch_size=2, training=True, seed=0)
    it = PrefetchIterator(ds, prefetch=2, num_threads=4)
    for _ in range(8):
        batch = next(it)
        assert batch["points"].shape == (2, 64, 3)
    it.close()
    assert store.resident <= 3
    assert store.loads > 3  # eviction + reload actually exercised

    # scene payloads survive the uint8/uint16 round trip
    s0 = store[0]
    np.testing.assert_allclose(s0.points, template.points, atol=1e-6)
    np.testing.assert_allclose(s0.depth, template.depth, atol=1e-3)

    # frame dataset over the store is lazy too (index from poses only)
    before = store.loads
    fds = FrameDataset(store, cfg, batch_size=2, training=True, seed=0)
    assert len(fds.index) == 150
    b = next(iter(fds))
    assert b["images"].shape == (2, 12, 16, 3)
    assert store.resident <= 3


def test_packed_transfer_roundtrip(rng):
    """Packed wire format (one device_put + jitted unpack): every array
    dtype/shape/value survives, non-arrays pass through."""
    import jax

    from mvpnet_tpu.data.pipeline import _pack_batch, _unpack_fn

    batch = {
        "images": rng.integers(0, 255, (2, 3, 8, 8, 3)).astype(np.uint8),
        "depth": rng.integers(0, 4000, (2, 3, 8, 8)).astype(np.uint16),
        "points": rng.normal(size=(2, 16, 3)).astype(np.float32),
        "seg_label": rng.integers(0, 5, (2, 16)).astype(np.int32),
        "n_real": 2,
        "meta": {"scene": "a"},  # unhashable non-array must not break caching
    }
    packed, layout, extras = _pack_batch(batch)
    assert packed.dtype == np.uint8
    assert extras == {"n_real": 2, "meta": {"scene": "a"}}
    # layout (the jit-cache key) carries arrays only and stays hashable even
    # with list/dict batch values (advisor round-3 low #4)
    hash(layout)
    out = dict(_unpack_fn(layout)(jax.device_put(packed)))
    out.update(extras)
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            got = np.asarray(out[k])
            assert got.dtype == v.dtype
            np.testing.assert_array_equal(got, v)
        else:
            assert out[k] == v


def test_prefetch_packed_batches(scene):
    """PrefetchIterator(pack=True) yields device dicts identical to the
    unpacked path."""
    from mvpnet_tpu.data.pipeline import ChunkDataset, PrefetchIterator

    cfg = small_data_cfg(num_points=64)
    ds = ChunkDataset([scene], cfg, batch_size=2, training=False, seed=5)
    it_plain = PrefetchIterator(ds, prefetch=1, num_threads=1)
    b_plain = next(it_plain)
    it_plain.close()
    ds2 = ChunkDataset([scene], cfg, batch_size=2, training=False, seed=5)
    it_packed = PrefetchIterator(ds2, prefetch=1, num_threads=1, pack=True)
    b_packed = next(it_packed)
    it_packed.close()
    assert set(b_plain) == set(b_packed)
    for k in b_plain:
        np.testing.assert_array_equal(np.asarray(b_plain[k]), np.asarray(b_packed[k]))
