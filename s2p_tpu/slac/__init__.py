from s2p_tpu.slac.latent import (
    FixedGaussianParams,
    GaussianHead,
    LatentModel,
    SlacDecoder,
    SlacEncoder,
    calculate_kl_divergence,
    create_feature_actions,
)
from s2p_tpu.slac.algo import SlacAlgorithm
from s2p_tpu.slac.convert import convert_latent_state_dict

__all__ = [
    "FixedGaussianParams",
    "GaussianHead",
    "LatentModel",
    "SlacDecoder",
    "SlacEncoder",
    "calculate_kl_divergence",
    "create_feature_actions",
    "SlacAlgorithm",
    "convert_latent_state_dict",
]
from s2p_tpu.slac.networks import SlacGaussianPolicy, TwinnedQNetwork
from s2p_tpu.slac.pretrain import pretrain_latent

__all__ += ["SlacGaussianPolicy", "TwinnedQNetwork", "pretrain_latent"]
