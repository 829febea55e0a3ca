from s2p_tpu.world_model.ensemble import (
    EnsembleTransition,
    convert_ensemble_state_dict,
    ensemble_nll_loss,
    make_ensemble_train_step,
    save_members,
    restore_members,
    soft_clamp,
)
from s2p_tpu.world_model.rollout import (
    compute_normalization,
    generate_augmented_dataset,
)

__all__ = [
    "EnsembleTransition",
    "convert_ensemble_state_dict",
    "ensemble_nll_loss",
    "make_ensemble_train_step",
    "save_members",
    "restore_members",
    "soft_clamp",
    "compute_normalization",
    "generate_augmented_dataset",
]
from s2p_tpu.world_model.rollout import generate_multistep_dataset

__all__ += ["generate_multistep_dataset"]
