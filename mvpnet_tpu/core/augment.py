"""Train-time augmentations as pure functions of a PRNG key.

Reference behavior [A]: random z-rotation of the chunk + image_xyz, flips,
color jitter, applied inside ``ScanNet2D3DChunks.__getitem__``
(mvpnet/data/scannet_2d3d.py, UNVERIFIED; SURVEY.md §3.4). Here they are
jittable device-side functions so augmentation rides the accelerator instead
of CPU worker processes. Geometry augmentations are applied consistently to
chunk points AND unprojected pixel clouds (both live in world space, so one
shared transform keeps the kNN fusion geometry coherent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_z_rotation(key, points, image_xyz, center=None):
    """Rotate points and pixel clouds by a shared random angle about +z.

    Args:
      key: PRNG key.
      points: (N, 3) chunk points.
      image_xyz: (..., 3) unprojected pixel positions (any leading shape).
      center: (3,) rotation center; defaults to the points' centroid xy.
    """
    angle = jax.random.uniform(key, (), minval=0.0, maxval=2.0 * jnp.pi)
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], points.dtype)
    if center is None:
        center = jnp.mean(points, axis=0)
    center = center * jnp.array([1.0, 1.0, 0.0], points.dtype)

    def apply(x):
        return (x - center) @ rot.T + center

    return apply(points), apply(image_xyz)


def random_flip(key, points, image_xyz, prob: float = 0.5):
    """Randomly mirror x and/or y (shared across points and pixel clouds)."""
    kx, ky = jax.random.split(key)
    center = jnp.mean(points, axis=0)

    def maybe_flip(k, axis, pts, img):
        do = jax.random.bernoulli(k, prob)
        sign = jnp.where(do, -1.0, 1.0).astype(pts.dtype)
        scale = jnp.ones((3,), pts.dtype).at[axis].set(sign)
        return (
            (pts - center) * scale + center,
            (img - center) * scale + center,
        )

    points, image_xyz = maybe_flip(kx, 0, points, image_xyz)
    points, image_xyz = maybe_flip(ky, 1, points, image_xyz)
    return points, image_xyz


def color_jitter(key, images, strength: float = 0.4):
    """Random brightness/contrast jitter on (..., 3) float images in [0,1]."""
    kb, kc = jax.random.split(key)
    brightness = jax.random.uniform(
        kb, (), minval=1.0 - strength, maxval=1.0 + strength
    )
    contrast = jax.random.uniform(
        kc, (), minval=1.0 - strength, maxval=1.0 + strength
    )
    mean = jnp.mean(images, axis=(-3, -2), keepdims=True)
    out = (images * brightness - mean) * contrast + mean
    return jnp.clip(out, 0.0, 1.0)


def augment_frame(key, image, label, *, flip_prob: float = 0.5, jitter: float = 0.4):
    """2D-frame augmentation for frame-level pretraining (reference
    ``ScanNet2D`` semantics, SURVEY.md §2.2 "2D dataset" / §3.6): random
    horizontal flip applied to image AND label together, plus color jitter.

    Args:
      key: PRNG key.
      image: (H, W, 3) float RGB in [0, 1].
      label: (H, W) int labels.
    """
    kf, kj = jax.random.split(key)
    if flip_prob > 0:
        do = jax.random.bernoulli(kf, flip_prob)
        image = jnp.where(do, image[:, ::-1, :], image)
        label = jnp.where(do, label[:, ::-1], label)
    if jitter > 0:
        image = color_jitter(kj, image, jitter)
    return image, label


def augment_chunk(
    key,
    points,
    image_xyz,
    images,
    *,
    z_rot: bool = True,
    flip_prob: float = 0.5,
    jitter: float = 0.4,
):
    """Full train-time augmentation for one chunk sample (jittable)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if z_rot:
        points, image_xyz = random_z_rotation(k1, points, image_xyz)
    if flip_prob > 0:
        points, image_xyz = random_flip(k2, points, image_xyz, flip_prob)
    if jitter > 0:
        images = color_jitter(k3, images, jitter)
    return points, image_xyz, images
