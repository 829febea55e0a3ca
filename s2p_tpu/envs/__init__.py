from s2p_tpu.envs.wrappers import NormalizedBoxEnv, StubEnv
from s2p_tpu.envs.dmc import make_dmc, DMC_ENVS

__all__ = ["NormalizedBoxEnv", "StubEnv", "make_dmc", "DMC_ENVS"]
