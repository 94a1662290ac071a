"""Camera model + depth unprojection (the "lift" stage).

TPU-native equivalent of the reference's per-worker NumPy unprojection inside
``ScanNet2D3DChunks.__getitem__`` (mvpnet/data/scannet_2d3d.py, UNVERIFIED;
semantics [C]: ``xyz_cam = K^-1 (u,v,1) d``, ``xyz_world = T_pose xyz_cam`` —
SURVEY.md §3.4). Here the lift is a batched, masked, jittable function that
runs on-device; XLA fuses it into surrounding producers/consumers, so a
hand-written Pallas kernel is unnecessary for this stage (it is bandwidth-
trivial elementwise work).

Conventions:
  * depth in meters, 0 (or negative) marks invalid pixels.
  * intrinsics K: (3, 3) pinhole; pose: (4, 4) camera-to-world.
  * outputs channels-last: xyz (..., H, W, 3) + validity mask (..., H, W).
"""
from __future__ import annotations

import jax.numpy as jnp


def unproject_depth(depth, intrinsics):
    """Lift a depth map to camera-space points.

    Args:
      depth: (..., H, W) float depth in meters; <=0 means invalid.
      intrinsics: (..., 3, 3) pinhole intrinsics (fx, fy, cx, cy layout).

    Returns:
      xyz_cam: (..., H, W, 3) camera-space coordinates.
      valid: (..., H, W) bool mask of pixels with positive depth.
    """
    h, w = depth.shape[-2:]
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    xyz = jnp.stack([x, y, depth], axis=-1)
    valid = depth > 0
    return xyz, valid


def world_from_camera(xyz_cam, pose):
    """Apply a (..., 4, 4) camera-to-world pose to (..., H, W, 3) points."""
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    # (..., H, W, 3) @ (..., 3, 3)^T + (..., 3)
    xyz_w = jnp.einsum("...hwj,...ij->...hwi", xyz_cam, rot)
    return xyz_w + trans[..., None, None, :]


def unproject_views(depth, intrinsics, poses, fill_value: float = 1e6):
    """Lift a stack of V posed depth maps into world space.

    Args:
      depth: (..., V, H, W) depth maps.
      intrinsics: (3, 3) or (..., V, 3, 3) intrinsics.
      poses: (..., V, 4, 4) camera-to-world transforms.
      fill_value: world coordinate assigned to invalid pixels. A large
        sentinel keeps invalid pixels out of every kNN ball without needing
        ragged shapes (fixed-shape + mask design, SURVEY.md §7 hard part 2).

    Returns:
      xyz_world: (..., V, H, W, 3)
      valid: (..., V, H, W) bool
    """
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(
            intrinsics, depth.shape[:-2] + (3, 3)
        )
    xyz_cam, valid = unproject_depth(depth, intrinsics)
    xyz_w = world_from_camera(xyz_cam, poses)
    xyz_w = jnp.where(valid[..., None], xyz_w, jnp.asarray(fill_value, xyz_w.dtype))
    return xyz_w, valid
