from s2p_tpu.gan.generator import (
    S2PGenerator,
    PositionalEmbedding,
    resolution_chain,
)
from s2p_tpu.gan.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from s2p_tpu.gan.perceptual import (
    LPIPSMetric,
    PerceptualLoss,
    VGG16Features,
    VGG19Features,
    load_lpips_linear,
    load_torch_vgg16,
    load_torch_vgg19,
)
from s2p_tpu.gan.inception import (
    InceptionV3Features,
    inception_fid_extractor,
    load_torch_inception_v3,
)
from s2p_tpu.gan.losses import (
    hinge_d_loss,
    hinge_g_loss,
    feature_matching_loss,
    GANLossConfig,
)
from s2p_tpu.gan.rollout import generate_rollout
from s2p_tpu.gan.fast_inference import fast_apply, generate_rollout_fast
from s2p_tpu.gan.training import GANTrainer, GANOptConfig

__all__ = [
    "S2PGenerator",
    "PositionalEmbedding",
    "resolution_chain",
    "MultiscaleDiscriminator",
    "NLayerDiscriminator",
    "VGG19Features",
    "VGG16Features",
    "PerceptualLoss",
    "LPIPSMetric",
    "load_lpips_linear",
    "load_torch_vgg16",
    "load_torch_vgg19",
    "InceptionV3Features",
    "inception_fid_extractor",
    "load_torch_inception_v3",
    "hinge_d_loss",
    "hinge_g_loss",
    "feature_matching_loss",
    "GANLossConfig",
    "generate_rollout",
    "fast_apply",
    "generate_rollout_fast",
    "GANTrainer",
    "GANOptConfig",
]
