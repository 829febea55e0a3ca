from s2p_tpu.utils.config import Config
from s2p_tpu.utils.logging import Logger, logger, setup_logger
from s2p_tpu.utils.timer import PhaseTimer, Timer
from s2p_tpu.utils.seeding import set_seed, RngStream

__all__ = [
    "Config",
    "Logger",
    "logger",
    "setup_logger",
    "PhaseTimer",
    "Timer",
    "set_seed",
    "RngStream",
]
