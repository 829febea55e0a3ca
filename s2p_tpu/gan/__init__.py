from s2p_tpu.gan.generator import (
    S2PGenerator,
    PositionalEmbedding,
    resolution_chain,
)
from s2p_tpu.gan.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from s2p_tpu.gan.perceptual import VGG19Features, PerceptualLoss
from s2p_tpu.gan.losses import (
    hinge_d_loss,
    hinge_g_loss,
    feature_matching_loss,
    GANLossConfig,
)
from s2p_tpu.gan.rollout import generate_rollout
from s2p_tpu.gan.training import GANTrainer, GANOptConfig

__all__ = [
    "S2PGenerator",
    "PositionalEmbedding",
    "resolution_chain",
    "MultiscaleDiscriminator",
    "NLayerDiscriminator",
    "VGG19Features",
    "PerceptualLoss",
    "hinge_d_loss",
    "hinge_g_loss",
    "feature_matching_loss",
    "GANLossConfig",
    "generate_rollout",
    "GANTrainer",
    "GANOptConfig",
]
