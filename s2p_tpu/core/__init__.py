from s2p_tpu.core.batch_rl_algorithm import BatchRLAlgorithm
from s2p_tpu.core.online_rl_algorithm import OnlineRLAlgorithm
from s2p_tpu.core.simple_offline_rl_algorithm import SimpleOfflineRlAlgorithm
from s2p_tpu.core.trainer import LossFunction, Serializable, Trainer
from s2p_tpu.core.video import VideoSaveFunction, dump_video

__all__ = [
    "BatchRLAlgorithm",
    "OnlineRLAlgorithm",
    "SimpleOfflineRlAlgorithm",
    "LossFunction",
    "Serializable",
    "Trainer",
    "VideoSaveFunction",
    "dump_video",
]
