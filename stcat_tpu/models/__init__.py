"""Model zoo: STCAT spatio-temporal grounding network and its components."""

from .attention import MultiHeadAttention, ProjectionFreeAttention
from .decoder import MLP, SpatialDecoder, TemplateGenerator, TimeDecoder
from .encoder import CrossModalEncoder
from .resnet import ResNet, build_resnet, downsample_mask
from .roberta import Roberta, RobertaConfig, TextEncoder
from .stcat import STCATNet


def build_model(cfg):
    """Build the STCAT network for a config. ref models/__init__.py:5-41.

    Returns the flax module; the criterion and loss weights live in
    stcat_tpu.train.criterion (pure functions, not modules).
    """
    return STCATNet(cfg)


__all__ = [
    "build_model",
    "STCATNet",
    "MultiHeadAttention",
    "ProjectionFreeAttention",
    "CrossModalEncoder",
    "SpatialDecoder",
    "TimeDecoder",
    "TemplateGenerator",
    "MLP",
    "ResNet",
    "build_resnet",
    "downsample_mask",
    "Roberta",
    "RobertaConfig",
    "TextEncoder",
]
