"""Model zoo: UNet-ResNet34 (2D), PN2SSG (3D), MVPNet3D (2D-3D fusion)."""

from mvpnet_tpu.models.build import build_model  # noqa: F401
from mvpnet_tpu.models.fusion import FeatureAggregation, MVPNet3D  # noqa: F401
from mvpnet_tpu.models.pointnet2 import PN2SSG  # noqa: F401
from mvpnet_tpu.models.unet import UNetResNet34  # noqa: F401
