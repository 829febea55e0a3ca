from s2p_tpu.utils.config import Config
from s2p_tpu.utils.logging import Logger, logger, setup_logger
from s2p_tpu.utils.timer import PhaseTimer, Timer
from s2p_tpu.utils.seeding import set_seed, RngStream
from s2p_tpu.utils.io import load_local_or_remote_file, save_pickle
from s2p_tpu.utils.launcher import (
    run_experiment,
    run_experiment_here,
    run_parallel_seeds,
)
from s2p_tpu.utils.sweep import (
    ConstantSchedule,
    DeterministicHyperparameterSweeper,
    LinearSchedule,
    PiecewiseLinearSchedule,
    RandomHyperparameterSweeper,
)

__all__ = [
    "Config",
    "Logger",
    "logger",
    "setup_logger",
    "PhaseTimer",
    "Timer",
    "set_seed",
    "RngStream",
    "load_local_or_remote_file",
    "save_pickle",
    "run_experiment",
    "run_experiment_here",
    "run_parallel_seeds",
    "ConstantSchedule",
    "DeterministicHyperparameterSweeper",
    "LinearSchedule",
    "PiecewiseLinearSchedule",
    "RandomHyperparameterSweeper",
]
