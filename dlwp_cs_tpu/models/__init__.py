"""Models: cubed-sphere U-Net, ConvLSTM family, layers, configs, registry."""

from dlwp_cs_tpu.models.config import (
    ConvLSTMConfig,
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    UNetConfig,
)
from dlwp_cs_tpu.models.convlstm import (
    CubeSphereConvLSTM,
    CubeSphereConvLSTMCell,
    CubeSphereConvLSTMNet,
    LatLonConvLSTMCell,
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

register_layer("CubeSphereConvLSTM", CubeSphereConvLSTM, is_module=True)


def build_model(model_config):
    """Model-family dispatch: config dataclass -> flax module.

    The typed analog of the reference's string registry resolving
    ``DLWPNeuralNet`` layer specs (SURVEY.md §2 row 6).
    """
    if isinstance(model_config, ConvLSTMConfig):
        return CubeSphereConvLSTMNet(model_config)
    if isinstance(model_config, UNetConfig):
        return CubeSphereUNet(model_config)
    raise TypeError(f"unknown model config {type(model_config).__name__}")


__all__ = [
    "ConvLSTMConfig",
    "DataConfig",
    "ExperimentConfig",
    "TrainConfig",
    "UNetConfig",
    "CubeSphereConvLSTM",
    "CubeSphereConvLSTMCell",
    "CubeSphereConvLSTMNet",
    "LatLonConvLSTMCell",
    "LatLonConv2D",
    "LatLonUNet",
    "CubeSphereConv2D",
    "SequentialSpec",
    "freeze_spec",
    "get_layer",
    "register_layer",
    "CubeSphereUNet",
    "build_model",
]
