from s2p_tpu.data.hdf5 import (
    load_rl_dataset,
    load_state_dataset,
    load_augment_dataset,
    save_dataset,
    make_slac_window_indices,
)
from s2p_tpu.data.replay import SlacReplayBuffer, SimpleReplayBuffer
from s2p_tpu.data.pair_dataset import S2PPairDataset
from s2p_tpu.data.env_replay_buffer import (
    EnvReplayBuffer,
    FixedNormalizer,
    Normalizer,
    PathBuilder,
)
from s2p_tpu.data.her_buffer import ObsDictRelabelingBuffer
from s2p_tpu.data.multitask_buffer import (
    MetaRLAlgorithm,
    MultiTaskReplayBuffer,
    SplitReplayBuffer,
)
from s2p_tpu.data.path_loaders import (
    DictToMDPPathLoader,
    HDF5PathLoader,
    load_hdf5,
)

__all__ = [
    "load_rl_dataset",
    "load_state_dataset",
    "load_augment_dataset",
    "save_dataset",
    "make_slac_window_indices",
    "SlacReplayBuffer",
    "SimpleReplayBuffer",
    "S2PPairDataset",
    "EnvReplayBuffer",
    "FixedNormalizer",
    "Normalizer",
    "PathBuilder",
    "ObsDictRelabelingBuffer",
    "MetaRLAlgorithm",
    "MultiTaskReplayBuffer",
    "SplitReplayBuffer",
    "DictToMDPPathLoader",
    "HDF5PathLoader",
    "load_hdf5",
]
