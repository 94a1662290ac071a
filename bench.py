"""Benchmark of record: chunk-inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.json): scenes/sec/chip with 8192-pt chunks and 5 views per
chunk, where one "scene" is the ScanNet-average sliding-window workload of
``CHUNKS_PER_SCENE`` chunk forwards (whole-scene eval slides ~0.5m strides
over a ~5x5m scene -> ~25 chunk positions; reference test_3d.py semantics,
SURVEY.md §3.2).

vs_baseline: the reference implementation is torch + CUDA on an NVIDIA GPU
(no published throughput — SURVEY.md §6) and cannot run here; the closest
measurable baseline on this machine is the same forward math implemented in
torch-CPU (the reference's own framework, its only runnable backend here).
That ratio is reported as vs_baseline and the absolute numbers are logged to
stderr for the record.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

CHUNKS_PER_SCENE = 25
B, N, V, H, W = 4, 8192, 5, 120, 160
TORCH_ITERS = 2
JAX_ITERS = 20


def build_batch(rng):
    from __graft_entry__ import _example_batch

    return _example_batch(rng, B=B, N=N, V=V, H=H, W=W)


def bench_ours() -> float:
    """Returns chunks/sec on the default jax device."""
    import jax
    from flax import nnx

    from mvpnet_tpu.config import Config
    from mvpnet_tpu.models import build_model
    from mvpnet_tpu.train.step import prepare_batch

    cfg = Config()
    model, _, _ = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    graphdef, state = nnx.split(model)

    @jax.jit
    def forward(state, batch):
        m = nnx.merge(graphdef, state)
        return m(prepare_batch(cfg, batch, training=False))[0]

    rng = np.random.default_rng(0)
    batch = jax.device_put(build_batch(rng))
    # NOTE: materialize with np.asarray — on the tunneled TPU platform
    # block_until_ready returns before execution completes.
    _ = np.asarray(forward(state, batch))
    t0 = time.perf_counter()
    for _ in range(JAX_ITERS):
        out = forward(state, batch)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / JAX_ITERS
    return B / dt


def bench_torch_baseline() -> float:
    """Same forward math in torch-CPU (the reference's framework); returns
    chunks/sec. Minimal re-statement for measurement only — NOT part of the
    framework."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(torch.get_num_threads(), 8))

    def basic_block(cin, cout, stride=1):
        layers = [
            nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        ]
        return nn.Sequential(*layers)

    def stage(cin, cout, blocks, stride):
        mods = [basic_block(cin, cout, stride)]
        mods += [basic_block(cout, cout) for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
                nn.BatchNorm2d(64),
                nn.ReLU(),
            )
            self.pool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layers = nn.ModuleList(
                [
                    stage(64, 64, 3, 1),
                    stage(64, 128, 4, 2),
                    stage(128, 256, 6, 2),
                    stage(256, 512, 3, 2),
                ]
            )
            self.dec = nn.ModuleList(
                [
                    nn.Conv2d(512 + 256, 256, 3, padding=1),
                    nn.Conv2d(256 + 128, 128, 3, padding=1),
                    nn.Conv2d(128 + 64, 64, 3, padding=1),
                    nn.Conv2d(64 + 64, 64, 3, padding=1),
                ]
            )
            self.final = nn.Conv2d(64, 64, 3, padding=1)
            self.agg = nn.Sequential(
                nn.Conv2d(67, 64, 1), nn.ReLU(), nn.Conv2d(64, 64, 1)
            )
            # PN2SSG-shaped stack (4 SA + 4 FP mlps as 1x1 convs)
            self.sa_mlps = nn.ModuleList(
                [
                    nn.Sequential(nn.Conv2d(67, 32, 1), nn.ReLU(), nn.Conv2d(32, 64, 1)),
                    nn.Sequential(nn.Conv2d(67, 64, 1), nn.ReLU(), nn.Conv2d(64, 128, 1)),
                    nn.Sequential(nn.Conv2d(131, 128, 1), nn.ReLU(), nn.Conv2d(128, 256, 1)),
                    nn.Sequential(nn.Conv2d(259, 256, 1), nn.ReLU(), nn.Conv2d(256, 512, 1)),
                ]
            )
            self.fp_mlps = nn.ModuleList(
                [
                    nn.Conv1d(768, 256, 1),
                    nn.Conv1d(384, 256, 1),
                    nn.Conv1d(320, 128, 1),
                    nn.Conv1d(192, 128, 1),
                ]
            )
            self.head = nn.Conv1d(128, 20, 1)

        def forward(self, images, points, image_xyz):
            bv = images.shape[0] * images.shape[1]
            x = images.reshape(bv, 3, H, W)
            feats = []
            x = self.stem(x)
            feats.append(x)
            x = self.pool(x)
            for l in self.layers:
                x = l(x)
                feats.append(x)
            y = feats[-1]
            for d, skip in zip(self.dec, reversed(feats[:-1])):
                y = torch.nn.functional.interpolate(y, size=skip.shape[2:])
                y = torch.relu(d(torch.cat([y, skip], dim=1)))
            y = torch.nn.functional.interpolate(y, size=(H, W))
            feat2d = self.final(y)  # (B*V, 64, H, W)

            Bb = points.shape[0]
            pix_feat = feat2d.reshape(Bb, V * H * W, 64)
            pix_xyz = image_xyz.reshape(Bb, V * H * W, 3)
            # fusion kNN (k=3): the reference runs scipy KDTree per chunk in
            # DataLoader workers (scannet_2d3d.py §3.4)
            from scipy.spatial import cKDTree

            fused = []
            for b in range(Bb):
                tree = cKDTree(pix_xyz[b].numpy())
                _, idx = tree.query(points[b].numpy(), k=3)
                g = pix_feat[b][torch.from_numpy(idx)]  # (N, 3, 64)
                gx = pix_xyz[b][torch.from_numpy(idx)]
                rel = points[b][:, None, :] - gx
                cat = torch.cat([g, rel], dim=-1).permute(2, 0, 1)[None]
                fused.append(self.agg(cat).amax(dim=3))
            fused = torch.cat(fused, 0)  # (B, 64, N)

            # SA/FP-shaped compute at canonical sizes (grouped mlps + interp)
            npoints = [1024, 256, 64, 16]
            xyz = points.permute(0, 2, 1)
            f = fused
            pyramid = [(xyz, f)]
            for level, m in enumerate(self.sa_mlps):
                npt = npoints[level]
                sel = torch.linspace(
                    0, f.shape[2] - 1, npt, dtype=torch.long
                )
                centers = pyramid[-1][0][:, :, sel]
                grouped = f[:, :, sel, None].expand(-1, -1, -1, 32).clone()
                rel = centers[:, :, :, None].expand(-1, -1, -1, 32)
                out = m(torch.cat([grouped, rel], dim=1)).amax(dim=3)
                pyramid.append((centers, out))
                f = out
            for level, m in enumerate(self.fp_mlps):
                coarse = pyramid[-1][1] if level == 0 else f
                fine = pyramid[-2 - level][1]
                up = torch.nn.functional.interpolate(
                    coarse, size=fine.shape[2]
                )
                f = torch.relu(m(torch.cat([up, fine], dim=1)))
            return self.head(f)

    net = Net().eval()
    rng = np.random.default_rng(0)
    batch = build_batch(rng)
    images = torch.from_numpy(batch["images"]).permute(0, 1, 4, 2, 3)
    points = torch.from_numpy(batch["points"])
    image_xyz = torch.from_numpy(
        rng.uniform(-2, 2, (B, V, H, W, 3)).astype(np.float32)
    )
    with torch.no_grad():
        net(images, points, image_xyz)  # warm
        t0 = time.perf_counter()
        for _ in range(TORCH_ITERS):
            net(images, points, image_xyz)
        dt = (time.perf_counter() - t0) / TORCH_ITERS
    return B / dt


def main():
    ours = bench_ours()
    try:
        base = bench_torch_baseline()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        base = float("nan")

    scenes_per_sec = ours / CHUNKS_PER_SCENE
    base_scenes = base / CHUNKS_PER_SCENE if np.isfinite(base) else float("nan")
    vs = ours / base if np.isfinite(base) and base > 0 else None
    print(
        f"ours: {ours:.2f} chunks/s ({scenes_per_sec:.3f} scenes/s); "
        f"torch-cpu baseline: {base:.2f} chunks/s ({base_scenes:.3f} scenes/s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "scenes/sec/chip (8192-pt chunks, 5 views, 25 chunks/scene)",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
