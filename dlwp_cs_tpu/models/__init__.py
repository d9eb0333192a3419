"""Models: cubed-sphere U-Net, layers, configs, declarative registry."""

from dlwp_cs_tpu.models.config import (
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    UNetConfig,
)
from dlwp_cs_tpu.models.latlon_unet import LatLonConv2D, LatLonUNet
from dlwp_cs_tpu.models.layers import CubeSphereConv2D
from dlwp_cs_tpu.models.registry import (
    SequentialSpec,
    freeze_spec,
    get_layer,
    register_layer,
)
from dlwp_cs_tpu.models.unet import CubeSphereUNet

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "TrainConfig",
    "UNetConfig",
    "LatLonConv2D",
    "LatLonUNet",
    "CubeSphereConv2D",
    "SequentialSpec",
    "freeze_spec",
    "get_layer",
    "register_layer",
    "CubeSphereUNet",
]
