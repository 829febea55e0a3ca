from s2p_tpu.data.hdf5 import (
    load_rl_dataset,
    load_augment_dataset,
    save_dataset,
    make_slac_window_indices,
)
from s2p_tpu.data.replay import SlacReplayBuffer, SimpleReplayBuffer
from s2p_tpu.data.pair_dataset import S2PPairDataset

__all__ = [
    "load_rl_dataset",
    "load_augment_dataset",
    "save_dataset",
    "make_slac_window_indices",
    "SlacReplayBuffer",
    "SimpleReplayBuffer",
    "S2PPairDataset",
]
