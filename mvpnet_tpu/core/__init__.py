"""Pure-JAX geometry core: camera model, depth unprojection, chunking,
augmentations. All functions are shape-static, mask-aware, and jittable."""

from mvpnet_tpu.core.camera import (  # noqa: F401
    unproject_depth,
    unproject_views,
    world_from_camera,
)
from mvpnet_tpu.core.augment import (  # noqa: F401
    random_z_rotation,
    random_flip,
    color_jitter,
    augment_chunk,
)
