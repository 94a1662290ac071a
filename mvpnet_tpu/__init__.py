"""mvpnet_tpu — a TPU-native multi-view 3D scene-understanding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
maxjaritz/mvpnet (MVPNet, ICCV-W 2019): 2D UNet-ResNet34 encoding of posed
RGB-D views, depth unprojection lifting per-pixel features into the scene
point cloud, kNN multi-view feature aggregation, and PointNet++ SSG set
abstraction for ScanNet v2 semantic segmentation.

Design (TPU-first, NOT a port):
  * channels-last layouts everywhere: points (B, N, 3), features (B, N, C),
    images NHWC — last dim maps to TPU lanes.
  * static shapes + masks instead of ragged structures.
  * geometry (unprojection, kNN) runs on-device; the host data path is
    decode + chunk/view selection only.
  * parallelism via jax.sharding.Mesh + NamedSharding/shard_map, collectives
    inserted by XLA (no hand-written comm backend).

Reference layer map: see SURVEY.md §1–§2 (reference mount was empty at survey
time; semantics pinned by the MVPNet paper, arXiv 1909.13603).
"""

__version__ = "0.1.0"
