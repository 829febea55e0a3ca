from s2p_tpu.nn.initializers import fanin_uniform, scaled_orthogonal
from s2p_tpu.nn.mlp import Mlp, ConcatMlp
from s2p_tpu.nn.cnn import CNN, DCNN
from s2p_tpu.nn.distributions import Normal, TanhNormal, Delta
from s2p_tpu.nn.linear_transform import LinearTransform

__all__ = [
    "fanin_uniform",
    "scaled_orthogonal",
    "Mlp",
    "ConcatMlp",
    "CNN",
    "DCNN",
    "Normal",
    "TanhNormal",
    "Delta",
    "LinearTransform",
]
from s2p_tpu.nn.mixture import GaussianMixture
from s2p_tpu.nn.mlp import MultiHeadedMlp
from s2p_tpu.nn.misc_nets import (
    FeatPointMlp,
    ImageStatePolicy,
    ImageStateQ,
    PretrainedCNN,
    SpatialSoftmaxEncoder,
)

__all__ += [
    "GaussianMixture",
    "MultiHeadedMlp",
    "FeatPointMlp",
    "ImageStatePolicy",
    "ImageStateQ",
    "PretrainedCNN",
    "SpatialSoftmaxEncoder",
]
