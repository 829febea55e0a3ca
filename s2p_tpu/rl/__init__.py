from s2p_tpu.rl.policies import (
    GaussianPolicy,
    TanhGaussianPolicy,
    make_deterministic,
)
from s2p_tpu.rl.critics import (
    CriticSLAC,
    Qfunction,
    Vfunction,
    q_subtree,
    soft_update,
    with_q_params,
)
from s2p_tpu.rl.iql import IQLTrainer
from s2p_tpu.rl.cql import CQLTrainer
from s2p_tpu.rl.sac import SACTrainer
from s2p_tpu.rl.vae_policy import PolicyFromQ, VAEPolicy
from s2p_tpu.rl.encoders import (
    CURL,
    EncoderCritic,
    EncoderQfunction,
    EncoderVFunction,
    PixelEncoder,
    TanhGaussianPolicyWithEncoder,
)

__all__ = [
    "GaussianPolicy",
    "TanhGaussianPolicy",
    "make_deterministic",
    "CriticSLAC",
    "Qfunction",
    "Vfunction",
    "q_subtree",
    "soft_update",
    "with_q_params",
    "IQLTrainer",
    "CQLTrainer",
    "SACTrainer",
    "PolicyFromQ",
    "VAEPolicy",
    "CURL",
    "EncoderCritic",
    "EncoderQfunction",
    "EncoderVFunction",
    "PixelEncoder",
    "TanhGaussianPolicyWithEncoder",
]
