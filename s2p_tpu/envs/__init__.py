from s2p_tpu.envs.wrappers import NormalizedBoxEnv, ProxyEnv, StubEnv
from s2p_tpu.envs.dmc import make_dmc, DMC_ENVS
from s2p_tpu.envs.stacks import FrameStack, StateStack, make
from s2p_tpu.envs.extra_wrappers import (
    DiscretizeEnv,
    HistoryEnv,
    RewardWrapperEnv,
    StackObservationEnv,
)
from s2p_tpu.envs.image_env import GymToMultiEnv, ImageEnv, MujocoGymToMultiEnv

__all__ = [
    "NormalizedBoxEnv",
    "ProxyEnv",
    "StubEnv",
    "make_dmc",
    "DMC_ENVS",
    "FrameStack",
    "StateStack",
    "make",
    "DiscretizeEnv",
    "HistoryEnv",
    "RewardWrapperEnv",
    "StackObservationEnv",
    "GymToMultiEnv",
    "ImageEnv",
    "MujocoGymToMultiEnv",
]
