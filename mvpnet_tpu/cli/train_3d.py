"""CLI: train the 3D fusion model.

Reference entry point equivalent: ``python mvpnet/train_3d.py --cfg <yaml>
[opts...]`` (UNVERIFIED; SURVEY.md §3.1). Usage:

  python -m mvpnet_tpu.cli.train_3d --cfg configs/scannet/mvpnet_3d.yaml \
      [train.batch_size=16 solver.base_lr=2e-3 ...]
"""
from __future__ import annotations

import argparse

from mvpnet_tpu.config import load_config
from mvpnet_tpu.train.loop import train


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default=None, help="YAML config overlay")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "opts", nargs="*", help="dotted overrides, e.g. train.max_steps=1000"
    )
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.cfg, args.opts)
    if cfg.model.name not in ("mvpnet_3d", "pn2ssg"):
        raise SystemExit(f"train_3d expects a 3D model, got {cfg.model.name}")
    train(cfg, resume=not args.no_resume)


if __name__ == "__main__":
    main()
