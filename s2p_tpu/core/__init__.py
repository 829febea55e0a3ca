from s2p_tpu.core.batch_rl_algorithm import BatchRLAlgorithm
from s2p_tpu.core.video import VideoSaveFunction, dump_video

__all__ = ["BatchRLAlgorithm", "VideoSaveFunction", "dump_video"]
